"""solar_data_tools_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of `slacgismo/solar-data-tools`.

Design (see SURVEY.md):

* **Relational layer** — everything the reference expresses as pandas/numpy
  array manipulation over day-matrices is re-expressed here as declarative
  DataFrame / Spark SQL transforms over two canonical long tables:

  - ``fact_measurement(site, ts, date, slot, value)`` — one row per reading,
    never materialized as a 2-D matrix (reference:
    solardatatools/matrix_embedding.py:27-69 builds a ``(slots, days)``
    numpy matrix; we keep the long form so Catalyst can prune/push down).
  - ``fact_daily(site, date, energy, density, ...)`` — one wide
    ``groupBy(site, date)`` aggregation producing every per-day score/flag
    the reference computes in separate numpy passes.

* **Solver layer** — the reference's per-series convex signal decompositions
  (solardatatools/signal_decompositions.py) run as grouped-map pandas UDFs
  (``applyInPandas``) per site: fleet-scale parallelism with tiny per-task
  inputs (365 x years rows).

Nothing in this package imports from or depends on the reference
implementation; citations in docstrings are for semantic parity only.
"""

__version__ = "0.1.0"

from solar_data_tools_spark.session import get_spark  # noqa: F401
