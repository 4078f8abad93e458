"""crawler_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the capabilities of the Go
distributed crawler at Nrich-sunny/crawler (reference, read-only at
/root/reference) as idiomatic PySpark dataflow: a partitioned priority
frontier drives batched fetch rounds over a Common-Crawl-style pages
table; a Bloom-prefiltered URL-seen table replaces the in-memory
visited map (reference engine/schedule.go:126); per-host politeness
budgets + robots rules are enforced with window functions; regex parse
rules (reference parse/doubanbook/parsebook.go, parse/doubangroup/
parseurl.go) run as vectorized Arrow/pandas UDFs producing
byte-identical extracted text.

Nothing here is a port — the reference's goroutines/channels/etcd
architecture is replaced by round-based (BFS-superstep) DataFrame
dataflow with explicit partitioning, broadcast, and skew handling.
"""

__version__ = "0.1.0"

from crawler_spark.config import EngineConfig, RuleSpec, TaskConfig  # noqa: F401
