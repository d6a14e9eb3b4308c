"""Declarative job plans: config model, validation, ETL lifecycle."""
