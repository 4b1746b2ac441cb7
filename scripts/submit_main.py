"""spark-submit entrypoint shim.

The north rule requires the engine to run via
``spark-submit --py-files pytod_spark.zip``. ``pytod_spark/cli.py``
uses package-relative imports, so it cannot be handed to spark-submit
as a bare file; this shim is the primary application file —
``pytod_spark`` itself resolves from the ``--py-files`` zip (built by
``pytod_spark.deploy.build_pyfiles_zip`` — pass an explicit target;
the no-arg default is a randomized per-process temp path), NOT from
the repo checkout.

    # per-user target: a FIXED shared path like /tmp/pytod_spark.zip
    # fails for the second user on a shared host (os.replace over a
    # file you don't own in sticky-bit /tmp raises EPERM)
    python -c "from pytod_spark.deploy import build_pyfiles_zip; \
               build_pyfiles_zip('/tmp/pytod_spark_$USER.zip')"
    spark-submit --master local[8] --py-files /tmp/pytod_spark_$USER.zip \
        scripts/submit_main.py validate --input ... --parent ... --run-dir ...

Exercised end-to-end by scripts/submit_smoke.sh.
"""

import sys

from pytod_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
