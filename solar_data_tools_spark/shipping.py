"""Ship this package to executor Python workers.

Solver-layer operators run numpy code inside ``applyInPandas``; cloudpickle
serializes those functions *by reference* to this package, so executor
workers must be able to import it. On a real cluster that's ``--py-files``;
here the same contract is satisfied programmatically with ``addPyFile`` of
a zip built from the installed package — which also works in ``local[N]``
mode where workers are separate Python processes that do NOT inherit the
driver's ``sys.path``.

Call :func:`ensure_package_on_executors` before any operator that executes
package code on workers (grouped-map / mapInPandas UDFs). Pure-SQL
operators never need it.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED_FLAG = "_sdt_spark_pkg_shipped"


def ensure_package_on_executors(spark) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_FLAG, False):
        return
    import solar_data_tools_spark

    pkg_dir = os.path.dirname(os.path.abspath(solar_data_tools_spark.__file__))
    parent = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"solar_data_tools_spark_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, parent))
    sc.addPyFile(zpath)
    setattr(sc, _SHIPPED_FLAG, True)
