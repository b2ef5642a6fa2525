"""spark-submit launcher for the CDC apply engine.

``spark-submit`` runs an application FILE (it has no ``-m``), so this
3-line shim is the file you submit; the engine itself ships alongside
as a ``--py-files`` zip::

    zip -r bdps.zip bigquery_delta_plugins_spark
    spark-submit --py-files bdps.zip bdps_submit.py \\
        apply --events /data/staged --warehouse /lake --table web.pages

The subprocess smoke test (tests/test_spark_submit.py) runs exactly
this invocation from a directory where the package is NOT importable,
proving the zip is the only delivery vehicle needed.
"""

import sys

from bigquery_delta_plugins_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
