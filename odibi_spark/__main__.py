"""``python -m odibi_spark`` entry point — the invocation exported
Airflow/Dagster tasks shell out to (orchestration/)."""

import sys

from odibi_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
