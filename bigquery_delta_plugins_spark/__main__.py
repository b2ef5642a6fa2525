"""``python -m bigquery_delta_plugins_spark`` / spark-submit entrypoint."""

import sys

from .cli import main

sys.exit(main())
