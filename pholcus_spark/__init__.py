"""pholcus_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the semantics of the reference crawl engine (andeya/pholcus,
Go; see SURVEY.md for file:line citations) as an idiomatic Spark dataflow:

* a URL **frontier** DataFrame/table with priority + politeness wave
  selection (window functions), replacing the goroutine scheduler
  (`app/scheduler/matrix.go`),
* a **url_seen** set realized as a bucketed key table plus partitioned
  Bloom-filter sidecars, replacing the in-memory success-history hash set
  (`app/aid/history/success.go:16-23`),
* a batched **fetch** stage (fixture equi-join in tests; pluggable
  `mapInPandas` HTTP fetcher for production), replacing the Surf
  downloader (`app/downloader/surfer/surf.go`),
* a vectorized Arrow **extract/validate** stage emitting item and
  image+caption rows (`app/spider/context.go:214-284`), and
* a snapshot-versioned table **catalog** (Iceberg-style commit/rollback
  over parquet when no Iceberg runtime jar is present) for resumable
  checkpoints.

Everything here derives from public knowledge only: the PySpark API and
the reference's observable semantics.
"""

__version__ = "0.1.0"
