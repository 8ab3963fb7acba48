"""blockspider_ray — a Ray-Data-native URL-frontier / fetch-scheduler engine.

A from-scratch re-expression of the data-processing semantics of
iquidus/blockspider (reference at /root/reference: a cursor-based,
reorg-safe blockchain crawler / Kafka producer) in the web-crawl domain,
built on ray.data.Dataset pipelines over zero-copy Arrow batches.

Layout:
  functions/  pure, vectorizable kernels (URL canonicalization, text/link
              extraction, robots matching, text analysis, hashing)
  state/      stateful structures (cuckoo filter seen-set, per-host frontier,
              politeness, rollback window, checkpoint codec)
  sources/    page-store readers (host-sharded Parquet fetch-sim)
  stages/     map_batches stage callables (fetch, extract, link routing, sinks)
  pipelines/  general data-processing pipelines over the TPC-H-ish test tables
              (relational ops, dedup, text stats, similarity search)
  oracle.py   sequential single-process reference-semantics crawler (the oracle)
  engine.py   the distributed Ray crawl engine (shard actors + Dataset stages)
"""

__version__ = "0.1.0"
