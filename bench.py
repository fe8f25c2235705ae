"""Benchmark harness (driver contract).

Measures, on local[$SPARK_GRAFT_CPUS] over $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1):
  1. indexing throughput: distributed build of the synthetic source-code
     corpus (docs/sec, MB/sec) — the north rule's primary metric;
  2. top-k BM25 query latencies over the documents-table index (p50/p99
     across the headline query set).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "docs_per_sec": ..., ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)


def _median3(fn) -> float:
    """Warm once, then 3 timed runs; the median — the ONE timing
    protocol every query line uses (this shared-host VM shows up to 3x
    run-to-run noise, see BENCH/BASELINE.md)."""
    fn()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return sorted(runs)[1]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "40000"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
                   or 0.1)
    except ValueError:
        sf = 0.1  # non-"sf<float>" dir names: label only, not an error

    # executor python workers import engine.py themselves: the leaf
    # partial-request cache must be disabled IN THEIR environment too,
    # or the distributed comparisons (q8_* / bm25 rows) are served as
    # dict hits after the first pass — mutating the driver module's
    # LEAF_CACHE_MAX_ENTRIES never reaches forked workers. Must be set
    # before the SparkSession (workers inherit the env at fork).
    os.environ["QW_LEAF_CACHE_ENTRIES"] = "0"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("quickwit-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from quickwit_spark.config import IndexConfig
    from quickwit_spark.index.builder import build_index
    from quickwit_spark.index.corpus import corpus_df
    from quickwit_spark.search import ast as A
    from quickwit_spark.search.engine import IndexSearcher

    queries: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix="qw_bench_")

    # --- 1. indexing throughput on the synthetic corpus -------------------
    # headline: the shuffle-free ROUTED build (the 100 TB path — input
    # pre-bucketed by doc key, as an Iceberg bucketed table would be; the
    # routing repartition is materialized in the cache, mirroring a
    # bucketed-table read). The exchange-bearing groupBy path is also
    # timed for transparency.
    from quickwit_spark.index.builder import route_partitions
    df = corpus_df(spark, n_docs, seed=42, num_partitions=cpus).cache()
    bytes_raw = df.selectExpr("sum(length(content))").collect()[0][0]
    df.count()  # materialize cache so build timing excludes generation

    cfg = IndexConfig(index_uid="bench", index_dir=os.path.join(work, "idx"))
    routed = (route_partitions(df, cfg, cpus)
              .repartition(cpus, "_pid").cache())
    routed.count()
    t0 = time.perf_counter()
    build_index(spark, routed, cfg, num_partitions=cpus, wave_size=cpus,
                input_routed=True)
    t_build = time.perf_counter() - t0
    queries["build_corpus_index"] = round(t_build, 3)
    docs_per_sec = n_docs / t_build
    mb_per_sec = bytes_raw / 1e6 / t_build
    routed.unpersist()

    # analyzer throughput, driver-local numpy path (r4: the hex variant
    # is fully vectorized — it must stay within ~1.2-1.4x of default)
    from quickwit_spark.functions.tokenizers import tokenize_batch
    sample = [r["content"] for r in df.limit(4000).collect()]
    for an, key in (("source_code_default", "tok_default_mb_s"),
                    ("source_code_with_hex", "tok_hex_mb_s")):
        tokenize_batch(sample[:200], analyzer=an)  # warm
        t0 = time.perf_counter()
        tokenize_batch(sample, analyzer=an)
        dt = time.perf_counter() - t0
        queries[key] = round(sum(map(len, sample)) / 1e6 / dt, 2)

    # CJK analyzer ingest throughput (r5: uint64-key ids path — no
    # per-token strings; deterministic zipfian Han corpus, the natural-
    # text frequency shape). Compare against the scalar per-doc loop it
    # replaced: >= 3x on this sample.
    import numpy as _np

    from quickwit_spark.functions.tokenizers import tokenize_batch_ids
    _rng = _np.random.default_rng(7)
    _ranks = _np.arange(1, 3001)
    _p = 1.0 / _ranks
    _p /= _p.sum()
    _han = _np.array([chr(0x4E00 + i) for i in range(3000)])
    cjk_sample = ["".join(_rng.choice(_han, size=380, p=_p)) + " abc 012"
                  for _ in range(1500)]
    cjk_bytes = sum(len(d.encode()) for d in cjk_sample)
    tokenize_batch_ids(cjk_sample[:100], analyzer="multilang")  # warm
    t0 = time.perf_counter()
    tokenize_batch_ids(cjk_sample, analyzer="multilang")
    queries["tok_cjk_ids_mb_s"] = round(
        cjk_bytes / 1e6 / (time.perf_counter() - t0), 2)

    # OTLP protobuf wire decode (the sanctioned per-payload Python slow
    # path — quantified so its cost is on the record): ~1.5k-record
    # batches, driver-local single-core MB/s
    from quickwit_spark.pipeline import otlp_pb
    payloads = [otlp_pb.encode_logs_request({"resourceLogs": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "bench"}}]},
        "scopeLogs": [{"scope": {"name": "qw", "version": "1"},
                       "logRecords": [{
                           "timeUnixNano": 1_700_000_000_000_000_000 + i,
                           "severityText": "INFO", "severityNumber": 9,
                           "body": {"stringValue": f"log line {i} merge"},
                           "attributes": [
                               {"key": "k", "value": {"intValue": i}}],
                       } for i in range(j, j + 16)]}]}]})
        for j in range(0, 24_000, 16)]
    pb_bytes = sum(len(p) for p in payloads)
    otlp_pb.decode_logs_request(payloads[0])  # warm
    t0 = time.perf_counter()
    for p in payloads:
        otlp_pb.decode_logs_request(p)
    queries["otlp_pb_decode_mb_s"] = round(
        pb_bytes / 1e6 / (time.perf_counter() - t0), 2)

    # real media decode (PNG zlib+unfilter, baseline JPEG Huffman+IDCT):
    # driver-local single-core MB/s over the encoded blob bytes — the
    # per-blob Python cost the multimodal mapInPandas stages pay
    from quickwit_spark.pipeline import media_codecs as _mc
    from quickwit_spark.pipeline.jpeg_codec import decode_jpeg, encode_jpeg
    _mrng = _np.random.default_rng(5)
    yy, xx = _np.meshgrid(_np.arange(128), _np.arange(128), indexing="ij")
    imgs = [_np.stack([(yy * a + xx * b) % 256 for a, b in
                       ((3, 2), (1, 5), (4, 1))], axis=2).astype(_np.uint8)
            + _mrng.integers(0, 8, (128, 128, 3), dtype=_np.uint8)
            for _ in range(40)]
    pngs = [_mc.encode_png(im) for im in imgs]
    jpgs = [encode_jpeg(im, quality=85, subsampling="420") for im in imgs]
    for dec, blobs, key in ((_mc.decode_png, pngs, "png_decode_mb_s"),
                            (decode_jpeg, jpgs, "jpeg_decode_mb_s")):
        dec(blobs[0])  # warm
        nbytes = sum(len(b) for b in blobs)
        t0 = time.perf_counter()
        for b in blobs:
            dec(b)
        queries[key] = round(nbytes / 1e6 / (time.perf_counter() - t0), 2)

    # Iceberg scan planning (sources/avro_ocf + iceberg): driver-local
    # metadata-only rate — manifest-list + manifest Avro decode through
    # 3-tier pruning, in thousand file-entries per second (scale trend
    # and the distributed planner twin: BENCH/iceberg_plan.md)
    import importlib.util as _ilu
    _spec = _ilu.spec_from_file_location(
        "ice_probe", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "scripts", "iceberg_plan_probe.py"))
    _ice_probe = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_ice_probe)
    _iroot = os.path.join(work, "ice_plan")
    _ice_probe.build_metadata_table(_iroot, 20, 200)
    _itbl = _ice_probe.iceberg.load_table(_iroot)
    _itbl.plan_files()  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        _iplan = _itbl.plan_files()
    queries["iceberg_plan_kfiles_per_s"] = round(
        len(_iplan.files) * 3 / (time.perf_counter() - t0) / 1e3, 1)

    # Kafka wire transport: produce -> fetch -> decode over a real TCP
    # loopback (RecordBatch v2 encode, CRC32C numpy fold, varint record
    # parse) — thousand records/sec through one consumer connection
    from quickwit_spark.streaming.kafka_wire import (KafkaWireClient,
                                                     LoopbackKafkaBroker)
    _kmsg = (b'{"repo":"r","path":"x.py","commit":"c","lang":"py",'
             b'"content":"bench kafka wire payload body text"}')
    with LoopbackKafkaBroker({"bench": 1}) as _kb:
        with KafkaWireClient(_kb.host, _kb.port) as _kc:
            _kc.api_versions()
            for _ in range(10):
                _kc.produce("bench", 0, [(None, _kmsg)] * 2000)
            _kc.fetch("bench", 0, 0)  # warm
            t0 = time.perf_counter()
            _off, _n = 0, 0
            while _n < 20_000:
                _recs, _ = _kc.fetch("bench", 0, _off)
                _n += len(_recs)
                _off = _recs[-1][0] + 1
            queries["kafka_wire_fetch_krecs_s"] = round(
                _n / (time.perf_counter() - t0) / 1e3, 1)

    # Iceberg CDC sync: maintain an index against a table that upserts
    # 2.5% and deletes 0.5% of 20k docs — delta wall time vs the full
    # rebuild the sync replaces (the 10^12-scale argument: the sync is
    # proportional to the DELTA, the rebuild to the corpus)
    from quickwit_spark.sources import iceberg as _ice
    from quickwit_spark.sources.iceberg_ingest import sync_iceberg
    import pyarrow as _pa
    _sroot = os.path.join(work, "cdc_tbl")
    _spdf = df.limit(20_000).toPandas()
    _ice.create_table(_sroot, _pa.Schema.from_pandas(_spdf))
    _ice.append_pandas(_sroot, _spdf, timestamp_ms=1000)
    _scfg = IndexConfig(index_uid="bench_sync",
                        index_dir=os.path.join(work, "idx_sync"))
    t0 = time.perf_counter()
    sync_iceberg(spark, _sroot, _scfg, partitions_per_ingest=cpus)
    queries["cdc_initial_sync_s"] = round(time.perf_counter() - t0, 3)
    _upd = _spdf.iloc[:500].copy()
    _upd["content"] = "refreshed " + _upd["content"]
    _ice.upsert_pandas(_sroot, _upd, ["path"], timestamp_ms=2000)
    _victims = _spdf["path"].iloc[500:600].tolist()
    _ice.delete_where(_sroot, [("path", "in", _victims)],
                      timestamp_ms=3000)
    t0 = time.perf_counter()
    _ssum = sync_iceberg(spark, _sroot, _scfg,
                         partitions_per_ingest=cpus)
    queries["cdc_delta_sync_s"] = round(time.perf_counter() - t0, 3)
    if _ssum["docs_retired"] != 600 or _ssum["docs"] != 500:
        # runtime canary, not a test assert (python -O strips those)
        raise RuntimeError(f"cdc sync canary: expected 600 retired / "
                           f"500 ingested, got {_ssum}")

    cfg_sh = IndexConfig(index_uid="bench_sh",
                         index_dir=os.path.join(work, "idx_sh"))
    t0 = time.perf_counter()
    build_index(spark, df, cfg_sh, num_partitions=cpus, wave_size=cpus)
    queries["build_corpus_index_shuffle"] = round(
        time.perf_counter() - t0, 3)
    df.unpersist()

    # --- 1b. hierarchical merge (the reference's split-build-then-merge
    # lifecycle); queries below run against the merged layout, where
    # posting lists are long enough for block-max pruning to matter
    from quickwit_spark.config import MergePolicyConfig
    from quickwit_spark.index.merge import run_merges
    from quickwit_spark.index.merge_policy import StableLogMergePolicy
    # warm the merge code path in the executor python workers first (a
    # tiny 2-segment scratch merge): the timed number is steady-state
    # merge throughput, not first-import cost — same warm-worker policy
    # the build section applies. Measured spread on identical input
    # without this: 3.6 s cold vs 2.1 s warm.
    cfg_w = IndexConfig(index_uid="bench_mw",
                        index_dir=os.path.join(work, "idx_mw"))
    build_index(spark, df.limit(400), cfg_w, num_partitions=2, wave_size=2)
    run_merges(cfg_w.index_dir, spark=spark, policy=StableLogMergePolicy(
        MergePolicyConfig(merge_factor=2, max_merge_factor=2,
                          min_level_num_docs=1)))
    t0 = time.perf_counter()
    run_merges(cfg.index_dir, spark=spark, policy=StableLogMergePolicy(
        MergePolicyConfig(merge_factor=8, max_merge_factor=12,
                          min_level_num_docs=1_000_000)))
    queries["merge_segments"] = round(time.perf_counter() - t0, 3)

    # HTTP serving layer: loopback end-to-end latency for the native
    # search route (routing + engine + JSON serialization) and OTLP
    # protobuf ingestion throughput through the full stack
    # (wire decode -> doc transform -> segment build -> publish)
    import urllib.request as _ur

    from quickwit_spark.pipeline import otlp_pb as _opb
    from quickwit_spark.search.http_api import SearchHttpServer
    with SearchHttpServer(work, writable=True) as _srv:
        _u = (f"{_srv.url}/api/v1/idx/search"
              "?query=content:merge&max_hits=10")
        for _ in range(5):  # warm (searcher resolve + reader cache)
            _ur.urlopen(_u, timeout=30).read()
        _lat = []
        for _ in range(60):
            t0 = time.perf_counter()
            _ur.urlopen(_u, timeout=30).read()
            _lat.append(time.perf_counter() - t0)
        _lat.sort()
        queries["http_search_p50_ms"] = round(
            _lat[len(_lat) // 2] * 1e3, 2)
        _n_rec, _t_ing = 4000, 0.0
        for i in range(3):
            _pl = _opb.encode_logs_request({"resourceLogs": [{
                "scopeLogs": [{"logRecords": [
                    {"timeUnixNano": str(10**18 + i),
                     "severityText": "INFO",
                     "body": {"stringValue":
                              f"bench log line {i} {j} payload"}}
                    for j in range(_n_rec)]}]}]})
            _rq = _ur.Request(
                f"{_srv.url}/api/v1/otlp/v1/logs", data=_pl,
                headers={"Content-Type": "application/x-protobuf"})
            t0 = time.perf_counter()
            _ur.urlopen(_rq, timeout=120).read()
            _t_ing += time.perf_counter() - t0
        queries["otlp_http_ingest_krecs_s"] = round(
            _n_rec * 3 / _t_ing / 1e3, 1)

    # --- 1e. doc-mapper distributed schemaless ingest ---------------------
    # raw JSON lines -> executor-side DocMapper projection -> segments
    # (builder.build_index_json): the 100 TB path for reference-shaped
    # configs; rate counts end-to-end wall incl. the manifest publish
    with tempfile.TemporaryDirectory() as _dmroot:
        import json as _json

        from quickwit_spark.index.builder import build_index_json
        _n_dm = 20_000
        _lines = [(_json.dumps(
            {"text": f"alpha bravo doc {i} payload {i % 97}",
             "n": i, "meta": {"lang": "en" if i % 3 else "fr",
                              "tags": ["a", "b"][: 1 + i % 2]}}),)
            for i in range(_n_dm)]
        _dmdf = spark.createDataFrame(_lines, "value string")
        _cfg_doc = {
            "version": "0.7", "index_id": "dmbench",
            "doc_mapping": {
                "mode": "dynamic",
                "field_mappings": [
                    {"name": "text", "type": "text",
                     "tokenizer": "default", "record": "position"},
                    {"name": "n", "type": "u64", "fast": True}],
                "dynamic_mapping": {"tokenizer": "default",
                                    "expand_dots": True,
                                    "fast": True}}}
        t0 = time.perf_counter()
        build_index_json(spark, _dmdf, _cfg_doc, _dmroot,
                         num_partitions=8)
        queries["docmapper_ingest_krecs_s"] = round(
            _n_dm / (time.perf_counter() - t0) / 1e3, 1)

    # --- 2. BM25 query latency over the corpus index (distributed leaves) -
    searcher = IndexSearcher(cfg.index_dir)  # in-process leaf loop
    qset = {
        "q_term_head": A.FullText("content", "getValue"),
        "q_term_mid": A.FullText("content", "mergeBatch"),
        "q_and2": A.Bool(must=(A.Term("content", "merge"),
                               A.Term("content", "query"))),
        "q_or2": A.Bool(should=(A.Term("content", "fetch"),
                                A.Term("content", "codec"))),
        "q_and3_or": A.Bool(must=(
            A.Term("content", "index"),
            A.Bool(should=(A.Term("content", "score"),
                           A.Term("content", "shard"))))),
        "q_filter_lang": A.Bool(must=(A.Term("content", "merge"),),
                                filter=(A.Term("lang", "python"),)),
        "q_must_not": A.Bool(must=(A.Term("content", "fetch"),),
                             must_not=(A.Term("content", "cache"),)),
        "q_phrase_fallback": A.FullText("content", "merge batch split"),
    }
    # the leaf partial-request cache would reduce repeat timings to dict
    # lookups — disable it so latencies measure the real scoring path
    # (reader/termdict caches stay warm, as before); its hit latency is
    # reported separately as q_term_head_leafcached
    import quickwit_spark.search.engine as _eng
    _eng.LEAF_CACHE_MAX_ENTRIES = 0
    lat_ms: list[float] = []
    for name, node in qset.items():
        # warmup once, then 3 timed runs; record median
        searcher.search(node, k=10, fetch_fields=False)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            searcher.search(node, k=10, fetch_fields=False)
            runs.append(time.perf_counter() - t0)
        runs.sort()
        queries[name] = round(runs[1], 4)
        lat_ms.extend(r * 1000 for r in runs)
    # explicit 512, NOT the saved pre-value: the env var above zeroes
    # the module default for the whole process, but THIS measurement is
    # the leaf cache's own hit latency
    _eng.LEAF_CACHE_MAX_ENTRIES = 512
    _eng.clear_leaf_cache()
    node = qset["q_term_head"]
    queries["q_term_head_leafcached"] = round(_median3(
        lambda: searcher.search(node, k=10, fetch_fields=False)), 4)
    _eng.LEAF_CACHE_MAX_ENTRIES = 0
    lat_ms.sort()
    p50 = lat_ms[len(lat_ms) // 2]
    p99 = lat_ms[min(len(lat_ms) - 1, int(len(lat_ms) * 0.99))]

    # block-max WAND pruned path (count_all=False): identical top-k,
    # skipped posting blocks reported
    from quickwit_spark.search.engine import get_reader
    from quickwit_spark.search.wand import STATS
    node = qset["q_or2"]
    queries["q_or2_wand"] = round(_median3(
        lambda: searcher.search(node, k=10, fetch_fields=False,
                                count_all=False)), 4)

    # --- 2b. score-skewed corpus: the block-max WAND payoff case --------
    # log-normal doc lengths + bursty tf => BM25 score variance; an
    # idf-asymmetric OR (mid-df term + very common terms) is answered
    # from the mid term's candidates, skipping most common-term blocks
    n_skew = int(os.environ.get("SPARK_GRAFT_BENCH_SKEW_DOCS", "20000"))
    skew_df = corpus_df(spark, n_skew, seed=7, num_partitions=8,
                        skew=True).cache()
    skew_df.count()
    skew_cfg = IndexConfig(index_uid="bench_skew",
                           index_dir=os.path.join(work, "idx_skew"))
    t0 = time.perf_counter()
    build_index(spark, skew_df, skew_cfg, num_partitions=8, wave_size=8)
    queries["build_skew_index"] = round(time.perf_counter() - t0, 3)
    skew_df.unpersist()
    run_merges(skew_cfg.index_dir, spark=spark, policy=StableLogMergePolicy(
        MergePolicyConfig(merge_factor=8, max_merge_factor=12,
                          min_level_num_docs=1_000_000)))
    skew_searcher = IndexSearcher(skew_cfg.index_dir)
    sk_segs = skew_searcher.manifest.segments()
    sk_big = max(sk_segs, key=lambda x: x["num_docs"])
    td = get_reader(os.path.join(skew_cfg.index_dir, "segments",
                                 sk_big["segment_id"]),
                    skew_searcher.tokenizer)._cached_termdict()
    nd = int(sk_big["num_docs"])
    mid_rows = td[(td.doc_freq >= nd // 200)
                  & (td.doc_freq <= nd // 50)].sort_values("doc_freq")
    big_rows = td.sort_values("doc_freq").iloc[-2:]
    skew_terms = [mid_rows.iloc[0]["term"], *big_rows["term"].tolist()] \
        if len(mid_rows) else ["merge", *big_rows["term"].tolist()]
    q_or_skew = A.Bool(should=tuple(A.Term("content", t)
                                    for t in skew_terms))
    wand_skip = 0.0
    for name, count_all in [("q_or3_skew_exh", True),
                            ("q_or3_skew_wand", False)]:
        skew_searcher.search(q_or_skew, k=10, fetch_fields=False,
                             count_all=count_all)
        STATS["blocks_decoded"] = STATS["blocks_total"] = 0
        queries[name] = round(_median3(
            lambda: skew_searcher.search(q_or_skew, k=10,
                                         fetch_fields=False,
                                         count_all=count_all)), 4)
        if name == "q_or3_skew_wand" and STATS["blocks_total"]:
            wand_skip = 1 - STATS["blocks_decoded"] / STATS["blocks_total"]

    # --- 2b2. positional index: vectorized phrase matching at scale -------
    n_pos = int(os.environ.get("SPARK_GRAFT_BENCH_POS_DOCS", "10000"))
    pos_df = corpus_df(spark, n_pos, seed=13, num_partitions=8,
                       skew=True).cache()
    pos_df.count()
    pos_cfg = IndexConfig(index_uid="bench_pos", record="position",
                          index_dir=os.path.join(work, "idx_pos"))
    t0 = time.perf_counter()
    build_index(spark, pos_df, pos_cfg, num_partitions=8, wave_size=8)
    queries["build_positional_index"] = round(time.perf_counter() - t0, 3)
    pos_df.unpersist()
    pos_searcher = IndexSearcher(pos_cfg.index_dir)
    seg0 = max(pos_searcher.manifest.segments(),
               key=lambda x: x["num_docs"])
    ptd = get_reader(os.path.join(pos_cfg.index_dir, "segments",
                                  seg0["segment_id"]),
                     pos_searcher.tokenizer)._cached_termdict()
    head_term = ptd.sort_values("doc_freq").iloc[-1]["term"]
    # bursty corpus guarantees adjacent self-repeats of the head term
    for name, node in [
            ("q_phrase_pos", A.Phrase("content",
                                      f"{head_term} {head_term}")),
            ("q_phrase_slop_pos", A.Phrase("content",
                                           f"{head_term} {head_term}",
                                           slop=2))]:
        queries[name] = round(_median3(
            lambda: pos_searcher.search(node, k=10,
                                        fetch_fields=False)), 4)

    # --- 2c. global term-partitioned layout over the skewed index ---------
    # (the 10^12-scale query path: O(#terms) partitions touched, block-max
    # WAND over the global rows)
    from quickwit_spark.index.global_index import (GlobalIndexSearcher,
                                                   build_term_partitioned)
    t0 = time.perf_counter()
    build_term_partitioned(spark, skew_cfg.index_dir,
                           num_term_partitions=8)
    queries["build_global_index"] = round(time.perf_counter() - t0, 3)
    gsearch = GlobalIndexSearcher(skew_cfg.index_dir)
    gterms = [t for t in skew_terms]
    global_skip = 0.0
    for name, ca in [("q_global_or_exh", True),
                     ("q_global_or_wand", False)]:
        gsearch.search_terms(gterms, operator="or", k=10, count_all=ca)
        STATS["blocks_decoded"] = STATS["blocks_total"] = 0
        queries[name] = round(_median3(
            lambda: gsearch.search_terms(gterms, operator="or", k=10,
                                         count_all=ca)), 4)
        if name == "q_global_or_wand" and STATS["blocks_total"]:
            global_skip = 1 - (STATS["blocks_decoded"]
                               / STATS["blocks_total"])

    # single term on the global layout: bound-ordered fast path with the
    # exact metadata count
    queries["q_global_term"] = round(_median3(
        lambda: gsearch.search_terms([gterms[0]], operator="or",
                                     k=10)), 4)

    # incremental refresh (the 10^12-doc publish path): append a 5%
    # delta's rows to the term-partitioned layout WITHOUT re-shuffling
    # the vocabulary — compare against build_global_index above
    from quickwit_spark.index.global_index import refresh_term_partitioned
    from quickwit_spark.streaming.incremental import ingest_batch
    delta_docs = corpus_df(spark, max(n_docs // 20, 100), seed=991)
    ingest_batch(delta_docs, skew_cfg, batch_id=97,
                 partitions_per_batch=2)
    t0 = time.perf_counter()
    refresh_term_partitioned(spark, skew_cfg.index_dir)
    queries["refresh_global_index"] = round(time.perf_counter() - t0, 3)

    # --- 3. documents-table index queries (driver-contract surface) -------
    import __spark_entry__ as entrymod
    # batched multi-query fan-out vs serial distributed calls (the
    # cluster-scale amortization: one Spark job for N queries); leaf
    # cache is disabled at this point so both sides pay real leaves
    dist = IndexSearcher(cfg.index_dir, spark=spark)
    batch_qs = list(qset.values())
    dist.search(batch_qs[0], k=10, fetch_fields=False)  # warm workers
    t0 = time.perf_counter()
    for qq in batch_qs:
        dist.search(qq, k=10, fetch_fields=False)
    # cost-based placement (root.rs:1643-1648 analog): this corpus is
    # under inprocess_doc_budget, so serial queries run in-process
    queries["q8_serial_dist"] = round(time.perf_counter() - t0, 4)
    forced = IndexSearcher(cfg.index_dir, spark=spark,
                           force_distributed=True)
    t0 = time.perf_counter()
    for qq in batch_qs:
        forced.search(qq, k=10, fetch_fields=False)
    queries["q8_serial_forced_dist"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    dist.search_many(batch_qs, k=10, fetch_fields=False)
    queries["q8_batched_dist"] = round(time.perf_counter() - t0, 4)

    for name in ["bm25_and_topk", "agg_terms_lang",
                 "agg_date_histogram_events"]:
        fn = entrymod.queries()[name]
        fn(spark, sf_dir).collect()  # warmup
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        queries[name] = round(time.perf_counter() - t0, 4)

    # headline total stays round-over-round comparable: the round-1
    # workload (build + merge + query set + driver-contract rows). The
    # round-2 additions (skewed corpus build, global layout build, their
    # query pairs) are reported as components and dedicated fields.
    r1_comparable = [n for n in queries
                     if not n.startswith(
                         ("build_skew", "build_global", "q_or3_skew",
                          "q_global", "build_corpus_index_shuffle",
                          "build_positional", "q_phrase_pos",
                          "q_phrase_slop_pos", "q8_",
                          "q_term_head_leafcached",
                          # refresh didn't exist in r1 — including it
                          # silently inflated r3's headline by ~1.8 s
                          # vs r1's
                          "refresh_global_index",
                          # MB/s / rate metrics, not seconds
                          "tok_", "otlp_pb_", "png_decode",
                          "jpeg_decode", "iceberg_plan",
                          # rate metric + post-r1 rows (r5 session 7)
                          "kafka_wire_", "cdc_",
                          # serving-layer rows (r5 session 8): ms /
                          # rate metrics, not headline seconds
                          "http_search_", "otlp_http_",
                          # doc-mapper ingest rate (r5 session 9)
                          "docmapper_"))]
    total = round(sum(queries[n] for n in r1_comparable), 3)
    out = {
        "metric": "index-build + top-k BM25 query wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "bench_docs": n_docs,
        "docs_per_sec": round(docs_per_sec, 1),
        "index_mb_per_sec": round(mb_per_sec, 2),
        "query_p50_ms": round(p50, 2),
        "query_p99_ms": round(p99, 2),
        "wand_block_skip_ratio": round(wand_skip, 4),
        "global_wand_skip_ratio": round(global_skip, 4),
        "cpus": cpus,
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
