#!/usr/bin/env python
"""spark-submit launcher for the packaged CLI.

spark-submit runs its primary file as ``__main__`` with no parent
package, which breaks relative imports inside ``cli.py`` — so the
production entry is this shim, which imports the package from the
``--py-files`` zip and forwards argv::

    zip -r xorfilter_net_spark.zip xorfilter_net_spark -x '*__pycache__*'
    spark-submit --py-files xorfilter_net_spark.zip tools/submit_cli.py \
        build-xor --input ... --key-expr ... --run-dir ...

Exercised end-to-end (real spark-submit subprocess, foreign cwd, zip
import) by tests/test_cli.py::test_spark_submit_pyfiles_zip.
"""

import sys

from xorfilter_net_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
