"""Engine exception types.

Reference parity: the reference defines ``JobConfigException``
(base_job.py:4) and (buggily) raises an undefined ``ETLJobException``
(etl/append.py:26). We define both properly.
"""


class JobConfigException(Exception):
    """Raised when a job config is structurally invalid."""


class ETLJobException(Exception):
    """Raised when a job fails at runtime (bad state, missing table...)."""


class DataSourceException(Exception):
    """Raised by datasource connectors (unknown type, unsupported op)."""
