"""Operator index: SURVEY.md §2 inventory → implementation sites.

The engine's operators live where Spark idiom puts them (the Pipe's plan
builders, the store, the params engine, the functions library) rather
than as one class per operator; this module is the explicit coverage map
and re-exports the operator surface for discoverability.

Scans / sources / sinks (§2.1)
  S1  JDBC read                  sources/jdbc.py::read_jdbc
  S2  bounded remote fetch       sources/jdbc.py::jdbc_fetch_definition, pipe.Pipe.fetch
  S3  definition CTE + bounds    pipe.Pipe.fetch (spark.sql WITH + Catalyst pushdown)
  S4  definition resolution      pipe.Pipe._resolve_definition
  S5  bulk append sink           store.ParquetPipeStore.append
  S6/S7 flavor bulk fast paths   N/A — parquet writes are columnar bulk
  S8  Valkey doc store           N/A — semantics covered by store.merge
  S9  API/HTTP source + server   sources/http.py (fetch_fn protocol, bounded GET,
                                 RemotePipe management client);
                                 sources/server.py (data/metadata routes +
                                 register/edit/delete management routes)
  S10 simple-lines text parse    dataframe.parse_simple_lines
  S11 canonical JSON export      export.df_to_json_rows / write_json / write_csv
  S12 Dask chunk scan            native Spark partitions (pipe.get_data as_iterator)

Projections / filters (§2.2)
  P1  select/omit columns        pipe.Pipe.get_data(select_columns/omit_columns)
  P2  params → WHERE             params.params_to_filter (unified build_where/query_df)
  P3  datetime range             params.datetime_filter (begin incl, end excl)
  P4  in-memory twin             same params engine — unified by design
  P5  replace_nulls              pipe.Pipe.get_data(replace_nulls)
  P6  injection guard            pipe._guard_definition

Joins (§2.3)
  J1  full-row anti (delta)      pipe.Pipe.filter_existing (eqNullSafe all-columns)
  J2  unseen/update split        pipe.Pipe.filter_existing (left_anti / left_semi)
  J3/J4 null-safe SQL joins      eqNullSafe — sentinel machinery deleted
  J5  upsert MERGE               store.ParquetPipeStore.merge (+ Pipe upsert mode)
  J6  per-id incremental fetch   pipe.Pipe.filter_new_per_id (broadcast sync-times)
  J7  update re-attach           pipe sync update path

Aggregations (§2.4)
  A1  sync time                  pipe.Pipe.get_sync_time (parquet-footer fast path)
  A2  rowcount                   pipe.Pipe.get_rowcount
  A3  patch dt bounds            pipe.filter_existing stats job
  A4  per-id sync times          pipe.filter_new_per_id / queries.events_per_user_sync_times
  A5  distinct count             pipe.Pipe.get_distinct_count
  A6  table size                 pipe.Pipe.get_size
  A7  chunk rowcount compare     pipe.Pipe.verify(rowcount_only=True)

Windows (§2.5)
  W1  dedup ranking              pipe.Pipe.deduplicate (row_number keep-last)
  W2  MySQL<8 emulation          N/A
  W3  pandas dedup               same window form (dropDuplicates is nondeterministic)

Sorts / limits (§2.6)
  O1-O4 order/limit              pipe.Pipe.get_data(order/limit)
  O5  backtrack slice            pipe.Pipe.get_backtrack_data

Set ops (§2.7)                   left_anti/left_semi joins; createDataFrame literals

Scalar functions (§2.8)          dtypes.py (canonical json/decimal/uuid/bytes,
                                 round_time, datetime↔epoch, parse_date_bound);
                                 F1 flavor date arithmetic → typed literals (N/A)

Maintenance (§2.9)
  M1  verify                     pipe.Pipe.verify (chunked re-sync + rowcount mode)
  M2  chunk grid                 chunks.get_chunk_bounds (epoch-aligned)
  M3  deduplicate                pipe.Pipe.deduplicate
  M4  drop/indices               pipe.Pipe.drop (indexes → partition/stats pruning)
  M5  clear                      pipe.Pipe.clear (bounded delete)
  M6  copy                       pipe.Pipe.copy_to
  M7  range partitioning         store layout (_mrsm_part epoch grid)
  M8  repartition                pipe.Pipe.repartition_grid
  M9  compress                   pipe.Pipe.optimize (parquet already columnar;
                                 cluster_by=[...] adds the ZORDER-lite
                                 within-partition sort)
  M10 vacuum/analyze             pipe.Pipe.vacuum / optimize
  M14 continuous aggregates      pipe parameters['rollups'] → per-sync
                                 bucket-scoped maintenance (eager) or
                                 r8 deferred policy ({'refresh':
                                 'deferred'}: durable invalidation log,
                                 coalesced flush-on-read), get_rollup
                                 (gapfill option), refresh_rollup,
                                 flush_rollups; also served over HTTP
                                 (sources/server.py)
  M15 retention policy           pipe.Pipe.prune (cutoff relative to the
                                 newest stored timestamp)
  (r11) cross-process commit     locking.ProcessLock (per-table flock, the
                                 reference's per-sync DB-transaction
                                 guarantee) + store swap manifest with
                                 roll-forward recovery
                                 (store.recover_interrupted_swap)
  (r11) maintained ANN index     pipe parameters['ann_index'] → IVF-PQ
                                 codes side table on the base partition
                                 grid: O(patch) file-delta encode on
                                 insert-only syncs, cell-scoped recompute
                                 on updates, frozen codebook;
                                 pipe.ann_search / get_ann_index /
                                 refresh_ann_index; gated by
                                 pipe_ann_index_sync
  (r11) fleet-scale registry     registry key index (.pipes_index.json,
                                 flock-maintained, dir-mtime invalidated);
                                 fetch_pipes_keys O(stat) warm at 10^5
                                 pipes (scripts/registry_bench.py)
  M11 autoincrement/autotime     pipe._apply_autoincrement / _apply_autotime
  M12 table creation             store first-write (schema from dtype registry)
  M13 temp-table GC              pipe.Pipe.vacuum (staging dirs)

Streaming (§2.10)                streaming/runner.py (foreachBatch → sync core
                                 with Observation fallback, watermarked
                                 rollups, sync_loop + schedule grammar);
                                 stream-stream interval join, streaming
                                 ingest + rollup maintenance gated in
                                 queries.py
Plugins (§2.11)                  Pipe(fetch_fn=..., sync_fn=...) protocols
Instance bulk actions            instance.py (get/sync/verify/deduplicate/
                                 drop/delete/clear/vacuum/tag pipes with
                                 key+tag filters, worker pooling)

Beyond-reference (training-data pipeline; BASELINE.json north star)
  dedup families                 functions/dedup.py (exact, n-gram Jaccard,
                                 MinHash+LSH with hot-bucket cap, SimHash +
                                 Hamming blocks, fused near-dup clusters via
                                 connected_components (adaptive union-find /
                                 min-label loop), survivor materialization,
                                 sentence-level dedup profile); winnowing
                                 (MOSS) fingerprints, exact-substring
                                 windows, MinHash-estimate validation
                                 (queries_llm.py)
  sketches                       deterministic cross-engine HLL (+ shard
                                 merge), count-min heavy hitters, Bloom
                                 contamination pre-screen, KMV set
                                 intersection (queries.py / queries_llm.py)
  data selection / scoring       DSIR importance weights, bigram-LM
                                 perplexity proxy, Gopher/adaptive quality,
                                 domain-mix weights, cluster-balanced
                                 embedding sampling
  similarity search              functions/similarity.py (brute-force + LSH/IVF
                                 ANN with shuffle-free centroid assignment
                                 and measured recall@5 for BOTH layouts,
                                 multi-table-LSH embedding near-dup,
                                 k-means, SemDeDup, int8 + PQ quantization,
                                 JL projection with measured distortion,
                                 power-iteration PCA)
  text analysis                  functions/text.py (stats, quality, lang-ID,
                                 fingerprint, Gopher repetition_stats,
                                 corpus-relative token rarity, overlapping
                                 context-window chunking, PII scrub,
                                 vocabulary head)
  corpus ops                     functions/corpus.py (one-pass prep,
                                 token-budget selection, hash-shard
                                 assignment, distributed prefix sum +
                                 sequence packing); stratified mixing
                                 sample + contamination scan
                                 (queries_llm.py)
  multimodal columns             functions/multimodal.py (binary payloads,
                                 Arrow-batched extract, stubbed decode)
  spatial operators (r7/r8)      functions/geo.py over the WKB dtype
                                 (geometry.py codec): bbox/ST_Extent,
                                 ST_Contains ray casting, grid-bucketed
                                 ST_DWithin radius join, path length,
                                 shoelace ST_Area; r8: ST_Transform
                                 (EPSG:4326<->3857, SRID carried, z and
                                 collections handled), ST_Intersects
                                 (CLRS segment test + containment; JVM
                                 column form segments_intersect_cols),
                                 exactly-once decode UDFs point_xy_once/
                                 segment_xy_once
  as-of join (r8)                functions/asof.py::asof_join — cross-
                                 table merge_asof/ASOF JOIN semantics as
                                 one last(ignorenulls) window per by-key
                                 (no join node, no range explosion);
                                 tolerance + left/inner
  skew toolkit                   functions/skew.py (salted agg/join/
                                 top-k; load-bearing in the sync diff
                                 and doc_domain_caps)
  graph analytics (r8)           functions/graph.py (basket_pairs
                                 co-occurrence edge builder — in-task
                                 array expansion; degree-oriented
                                 triangle counting; pagerank_int —
                                 exact scaled-integer PageRank, one
                                 join+agg per iteration, flat lineage
                                 via per-iteration checkpoint; soaked
                                 near-linear at 10x, SCALE.md)
  distributed ranking (r8)       functions/ranking.py
                                 (global_row_number — range partitions
                                 + per-partition offsets instead of the
                                 single-partition window; NTILE-free
                                 integer quartile buckets; backs
                                 customer_rfm_segments)
  analytics widening             queries.py (full 22-shape TPC-H sweep,
                                 funnel + conversion latency, cohort
                                 retention, z-score outliers, histogram,
                                 gap-fill+LOCF, Markov transitions,
                                 time-weighted avg, counter deltas,
                                 market-basket affinity)

Every operator with deterministic output also appears in the query
catalog (queries.py / queries_llm.py) with a DuckDB oracle.
"""

from meerschaum_spark.params import datetime_filter, params_to_filter
from meerschaum_spark.pipe import Pipe, SyncResult
from meerschaum_spark.store import ParquetPipeStore

__all__ = ["Pipe", "SyncResult", "ParquetPipeStore",
           "params_to_filter", "datetime_filter"]
