"""``python -m flink_cdc_dsql_master_spark`` — see cli.py."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
