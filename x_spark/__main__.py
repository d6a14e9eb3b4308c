from x_spark.cli import main

raise SystemExit(main())
