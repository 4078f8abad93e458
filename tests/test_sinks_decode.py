"""Items-sink per-task tables + charset decode hook + multimodal
feature plumbing."""

import pandas as pd

from crawler_spark.functions.decode import decode_html_bytes
from crawler_spark.plans.frontier import FrontierEngine
from crawler_spark.config import EngineConfig
from crawler_spark.rules import BOOK_TASK
from crawler_spark.sources.corpus import CORPUS_SCHEMA, build_corpus_pdf
from crawler_spark.sources.items_sink import task_items_table, item_fields_of


def test_decode_utf8_and_fallbacks():
    assert decode_html_bytes("héllo 阳台".encode()) == "héllo 阳台"
    assert decode_html_bytes(b"\xef\xbb\xbfabc") == "abc"
    # invalid utf-8 → latin-1 fallback, never raises
    assert decode_html_bytes(b"\xff\xfd\x80") is not None
    assert decode_html_bytes(None) is None


def test_decode_udf_matches_corpus_text(spark):
    pdf = build_corpus_pdf(
        seed=42, n_generic=5, n_hosts=2, n_lists=1, books_per_list=1, n_topics=1
    )
    from pyspark.sql import functions as F

    from crawler_spark.functions.decode import decode_html_udf

    df = spark.createDataFrame(pdf, CORPUS_SCHEMA)
    rows = df.withColumn("decoded", decode_html_udf(F.col("html"))).collect()
    for r in rows:
        assert r.decoded == r.text  # byte-identical transcode


def test_items_sink_per_task_table(spark, workdir):
    pdf = build_corpus_pdf(
        seed=42, n_generic=0, n_lists=2, books_per_list=2, n_topics=0
    )
    corpus = spark.createDataFrame(pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(batch_size=8, num_partitions=4, use_bloom=False)
    eng = FrontierEngine(spark, [BOOK_TASK], corpus, cfg, workdir=workdir)
    eng.run(max_rounds=20)
    fields = item_fields_of(BOOK_TASK)
    assert fields == ["书名", "作者", "页数", "出版社", "得分", "价格", "简介"]
    table = task_items_table(eng.read_items(), BOOK_TASK).toPandas()
    assert len(table) == 4  # 2 lists × 2 books
    assert set(fields + ["url", "warc_ts"]) == set(table.columns)
    assert (table["作者"] != "").all()
    # 页数 passed through strconv.Atoi semantics → numeric string
    assert table["页数"].str.match(r"^-?\d+$").all()


def test_multimodal_plumbing(spark):
    from crawler_spark.operators.multimodal import (
        attach_fake_payload,
        extract_features,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["abc", "defg"]})
    )
    feats = extract_features(attach_fake_payload(docs)).collect()
    assert len(feats) == 2
    by_id = {r.media_id: r for r in feats}
    assert by_id[1].n_bytes == 3
    assert by_id[1].kind == "image"
    assert by_id[1].feature_dim == 512
    assert 64 <= by_id[1].width < 2048
    import hashlib

    assert by_id[2].content_hash == hashlib.md5(b"defg").hexdigest()


def test_dedup_corpus_keeps_latest_capture(spark):
    """Real crawl dumps carry recaptures of the same canon_url; the
    CLI load path must keep exactly one row per canon_url —
    deterministically the latest warc_ts."""
    from crawler_spark.sources.corpus import CORPUS_SCHEMA, dedup_corpus

    rows = pd.DataFrame(
        {
            "url": ["https://a.com/x"] * 2 + ["https://b.com/y"],
            "canon_url": ["https://a.com/x"] * 2 + ["https://b.com/y"],
            "warc_ts": pd.to_datetime(
                ["2024-01-01", "2024-06-01", "2024-01-01"]
            ),
            "html": [b"old", b"new", b"only"],
            "text": ["old", "new", "only"],
            "lang": ["en"] * 3,
        }
    )
    out = dedup_corpus(spark.createDataFrame(rows, CORPUS_SCHEMA)).collect()
    by_url = {r.canon_url: r.text for r in out}
    assert by_url == {"https://a.com/x": "new", "https://b.com/y": "only"}


def test_multimodal_frames_and_resize(spark):
    """Frame sampling changes cardinality (1 media → n_frames rows,
    evenly spaced, per-frame stable ids); resize planning is
    aspect-preserving with integer-exact dims."""
    import hashlib

    from crawler_spark.operators.multimodal import (
        attach_fake_payload,
        resize_images,
        sample_frames,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["abc", "x" * 1000]})
    )
    media = attach_fake_payload(docs, kind="video")
    frames = sample_frames(media).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r.frame_index)
        h = hashlib.md5(
            (b"abc" if mid == 1 else b"x" * 1000)
        ).hexdigest()
        assert len(rows) == 1 + int(h[8:12], 16) % 7
        assert rows[0].timestamp_ms == 0
        assert [r.frame_index for r in rows] == list(range(len(rows)))
        assert rows[0].frame_hash == hashlib.md5(f"{h}_0".encode()).hexdigest()
        # monotone, within duration (n_bytes ms)
        ts = [r.timestamp_ms for r in rows]
        assert ts == sorted(ts) and ts[-1] < (3 if mid == 1 else 1000)

    rs = {r.media_id: r for r in resize_images(media, max_side=256).collect()}
    for r in rs.values():
        assert max(r.out_width, r.out_height) <= 256
        if max(r.width, r.height) > 256:
            # aspect preserved to integer truncation
            assert r.out_width == (r.width * 256) // max(r.width, r.height)
            assert r.out_height == (r.height * 256) // max(r.width, r.height)
        else:
            assert (r.out_width, r.out_height) == (r.width, r.height)
            assert r.scale == "1.000000"


def test_frontier_decodes_bytes_only_corpus(spark, workdir):
    """An html-bytes corpus (text all NULL) must crawl identically to
    the oracle fed the decoded text — the `html binary` column of the
    input_hint schema flows through decode_html_udf end-to-end
    (reference transcodes before parse, collect/collect.go:85-96).
    Includes a latin-1 page to exercise the fallback branch."""
    from crawler_spark.plans.oracle import GoOracle
    from crawler_spark.sources.corpus import generic_task
    from tests.test_frontier import assert_equivalent

    pdf = build_corpus_pdf(
        seed=7, n_generic=40, n_hosts=4, out_degree=4,
        n_lists=0, books_per_list=0, n_topics=0,
    )
    # wipe text; bodies live only as bytes (one page latin-1-encoded)
    enc = ["latin-1" if i == 3 else "utf-8" for i in range(len(pdf))]
    pdf["html"] = [
        t.replace("page", "págé").encode(e, errors="replace") if e == "latin-1"
        else t.encode()
        for t, e in zip(pdf["text"], enc)
    ]
    pdf["text"] = None
    corpus = spark.createDataFrame(pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(batch_size=8, num_partitions=4, use_bloom=False,
                       decode_html=True)
    tasks = [generic_task(max_depth=3)]
    eng = FrontierEngine(spark, tasks, corpus, cfg, workdir=workdir)
    eng.run(max_rounds=20)
    oracle = GoOracle(
        tasks,
        {u: decode_html_bytes(h) for u, h in zip(pdf["canon_url"], pdf["html"])},
        batch_size=8,
        max_rounds=20,
    ).run()
    assert_equivalent(eng, oracle)
