"""Deterministic synthetic Common-Crawl-style page corpus.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
``(url string, warc_ts timestamp, html binary, text string, lang
string)`` plus a precomputed ``canon_url`` join key (the simulated
fetch joins on the canonical form — HTTP servers never see fragments,
so a request for ``...#frag`` must hit the same page).

Two sections, one generator:

1. **douban section** — a root hub on book.douban.com whose HTML embeds
   the reference's exact patterns (tag links → list pages → detail
   pages with author/publisher/... fields; group-topic pages with/
   without 阳台 content) so the reference rule trees crawl it and
   golden tests can pin byte-identical extraction.
2. **generic section** — a seeded random web graph over ``n_hosts``
   hosts with one hot host holding ~30% of pages (skew/salting path)
   and ~2% of link targets absent from the corpus (fetch-failure path,
   cf. reference collect/collect.go:35-37). Pages link with
   ``<a href="..." class="link">`` handled by the cyclic GENERIC_RULE,
   giving unbounded-depth BFS for politeness/bench work.

Content for page *i* is a pure function of *(seed, i)* — the corpus is
generated distributed (``spark.range(n).mapInPandas``) without ever
materializing on the driver, which is how you'd synthesize a 10^10-URL
frontier: generative, partition-local, no shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from crawler_spark.config import RuleSpec, TaskConfig
from crawler_spark.functions.urlnorm import canonicalize_url

CORPUS_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("canon_url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

GENERIC_LINK_RE = r'<a href="([^"]+)" class="link">'

GENERIC_RULE = RuleSpec(
    name="link",
    link_regex=GENERIC_LINK_RE,
    next_rule="link",  # cyclic: BFS runs until frontier drains / max_depth
    next_priority=0,
)


def dedup_corpus(corpus: DataFrame) -> DataFrame:
    """One row per canon_url, deterministically (latest warc_ts, ties
    by text) — the fetch join and the single-fetch-per-URL crawl
    semantics assume a keyed corpus, but real crawl dumps carry
    recaptures. One shuffle at load time, zero per-round cost."""
    from pyspark.sql import Window

    w = Window.partitionBy("canon_url").orderBy(
        F.col("warc_ts").desc(), F.col("text").asc()
    )
    return (
        corpus.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def generic_task(
    max_depth: int = 5,
    budget_count: int = 0,
    budget_window_s: int = 60,
    n_seeds: int = 1,
    seed: int = 42,
    n_hosts: int = 10,
) -> TaskConfig:
    """Cyclic-link crawl task over the generic corpus section.

    ``n_seeds > 1`` seeds the first ``n_seeds`` page urls (a crawl
    restarted from a frontier snapshot looks like this — bench uses it
    to skip BFS warm-up rounds)."""
    seeds = tuple(
        (generic_url(seed, i, n_hosts), 1 if i == 0 else 0, "link")
        for i in range(n_seeds)
    )
    return TaskConfig(
        name="generic_crawl",
        seeds=seeds,
        max_depth=max_depth,
        budget_count=budget_count,
        budget_window_s=budget_window_s,
        rules=(GENERIC_RULE,),
    )


def _mix(seed: int, *vals: int) -> int:
    """Deterministic 64-bit mix (splitmix-style) — our only RNG."""
    h = (seed ^ 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    for v in vals:
        h = (h ^ (v & 0xFFFFFFFFFFFFFFFF)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        h = (h ^ (h >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 31
    return h


# ------------------------------------------------------------------
# generic web-graph section
# ------------------------------------------------------------------


def generic_host(seed: int, i: int, n_hosts: int, hot_share: float = 0.30) -> str:
    """Host of generic page i; host 0 gets ~hot_share of all pages.

    Page 0 is pinned to host 0 so the generic task's seed URL
    (https://www.site0000.example/p/0) always resolves.
    """
    if i == 0:
        return "www.site0000.example"
    r = _mix(seed, i, 1)
    if (r % 10_000) < int(hot_share * 10_000):
        h = 0
    else:
        h = 1 + _mix(seed, i, 2) % max(1, n_hosts - 1)
    return f"www.site{h:04d}.example"


def generic_url(seed: int, i: int, n_hosts: int) -> str:
    return f"https://{generic_host(seed, i, n_hosts)}/p/{i}"


def _noisy(url: str, r: int) -> str:
    """Un-canonical variants of a URL for links (exercise urlnorm).

    Every variant canonicalizes back to ``canonicalize_url(url)`` —
    fragment stripped, host lowercased, default port removed — so the
    simulated fetch (join on canon_url) still resolves the page.
    """
    m = r % 4
    if m == 0:
        return url
    if m == 1:
        return url + "#frag" + str(r % 7)
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    if m == 2:
        return f"{scheme}://{host.upper()}/{path}"
    return f"{scheme}://{host}:443/{path}"


_FILLER_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"
    " tempor incididunt ut labore et dolore magna aliqua enim minim veniam"
).split()


def _filler_paragraph(seed: int, i: int, j: int, n_bytes: int) -> str:
    """Deterministic prose-ish filler of ~n_bytes (cheap to build:
    one string multiply off a seeded 12-word stem, no per-word RNG)."""
    if n_bytes <= 0:
        return ""
    r = _mix(seed, i, 7, j)
    stem = " ".join(
        _FILLER_WORDS[(r + k * 7) % len(_FILLER_WORDS)] for k in range(12)
    )
    body = (stem + f" p{i}w{j} ") * (n_bytes // (len(stem) + 8) + 1)
    return f"<p>{body[:n_bytes]}</p>"


def generic_page_text(
    seed: int, i: int, n: int, n_hosts: int, out_degree: int = 8,
    filler_kb: int = 0,
) -> str:
    """HTML of generic page i: out_degree links, ~2% dangling.

    ``filler_kb > 0`` pads the page to a realistic size with
    deterministic prose interleaved BETWEEN the anchor tags, so the
    link-extract regex must scan the whole body — per-page parse cost
    then approximates a real crawl (reference pages are tens of KB,
    not the bare ~0.7 KB skeleton used by the correctness tests)."""
    per_link = (filler_kb * 1024) // max(out_degree, 1)
    parts = [f"<html><head><title>page {i}</title></head><body>"]
    parts.append(f"<h1>Synthetic page {i}</h1>")
    for j in range(out_degree):
        r = _mix(seed, i, 3, j)
        if r % 100 < 2:  # dangling link: target outside the corpus
            target_url = f"https://www.site{r % n_hosts:04d}.example/missing/{r % 10**9}"
        else:
            t = (i * 131 + 1 + r % (2 * out_degree * 997)) % n
            target_url = _noisy(generic_url(seed, t, n_hosts), r)
        if per_link:
            parts.append(_filler_paragraph(seed, i, j, per_link))
        parts.append(f'<a href="{target_url}" class="link">link {j}</a>')
    parts.append(f"<p>filler text body of page {i} lorem synthetic</p></body></html>")
    return "\n".join(parts)


# ------------------------------------------------------------------
# douban section — exercises the reference rule trees exactly
# ------------------------------------------------------------------

_AUTHORS = ["鲁迅", "老舍", "钱钟书", "张爱玲", "莫言", "余华"]
_PUBS = ["人民文学出版社", "三联书店", "商务印书馆", "中华书局"]


def douban_pages(
    seed: int, n_lists: int = 6, books_per_list: int = 5, n_topics: int = 8
) -> list[tuple[str, str]]:
    """(url, text) pairs for the douban fixture sub-corpus."""
    pages: list[tuple[str, str]] = []
    # root hub: tag links (path-only hrefs — the tag rule prepends
    # https://book.douban.com, reference parsebook.go:56)
    tag_links = [
        f'<a href="/tag/列表{k}?b=2&a=1" class="tag">标签{k}</a>' for k in range(n_lists)
    ]
    root_text = (
        "<html><body><div class='tags'>" + "\n".join(tag_links) + "</div></body></html>"
    )
    pages.append(("https://book.douban.com", root_text))
    for k in range(n_lists):
        book_links = []
        for b in range(books_per_list):
            bid = k * books_per_list + b
            title = f"书籍{bid}"
            book_links.append(
                f'<li><a class="x" href="https://book.douban.com/subject/{bid}/"'
                f' title="{title}">{title}</a></li>'
            )
        list_text = "<html><body><ul>" + "\n".join(book_links) + "</ul></body></html>"
        pages.append((f"https://book.douban.com/tag/列表{k}?a=1&b=2", list_text))
        for b in range(books_per_list):
            bid = k * books_per_list + b
            r = _mix(seed, bid, 7)
            author = _AUTHORS[r % len(_AUTHORS)]
            pub = _PUBS[r % len(_PUBS)]
            npages = "" if r % 5 == 0 else str(100 + r % 900)
            score = f"{(r % 40 + 60) / 10.0:.1f}"
            price = f"{r % 80 + 20}.00元"
            intro = f"这是第{bid}本书的简介内容。"
            detail = (
                "<html><body>"
                f'<span class="pl"> 作者</span>:\n <a href="/author/{r % 9}">'
                f"{author}</a>\n"
                f'<span class="pl">出版社:</span>\n<a href="/press/{r % 4}">'
                f"{pub}</a><br/>\n"
                f'<span class="pl">页数:</span> {npages}<br/>\n'
                f'<span class="pl">定价:</span>{price}<br/>\n'
                f'<strong class="ll rating_num " property="v:average">'
                f"{score}</strong>\n"
                f'<div class="intro"><h2>内容简介</h2><p>{intro}</p></div>'
                "</body></html>"
            )
            pages.append((f"https://book.douban.com/subject/{bid}/", detail))
    # group-discussion page + topic pages (doubangroup task)
    topic_links = [
        f'<a href="https://www.douban.com/group/topic/{_mix(seed, t, 8) % 10**8:x}/"'
        f' class="title">话题{t}</a>'
        for t in range(n_topics)
    ]
    disc_text = "<html><body>" + "\n".join(topic_links) + "</body></html>"
    pages.append(("https://www.douban.com/group/szsh/discussion?start=0", disc_text))
    for t in range(n_topics):
        tid = f"{_mix(seed, t, 8) % 10**8:x}"
        sun = "阳台很大，采光极好。" if _mix(seed, t, 9) % 2 == 0 else "没有描述。"
        topic_text = (
            '<html><body><div class="topic-content">'
            f"<p>房源信息：{sun}</p><div class='aside'></div></div></body></html>"
        )
        pages.append((f"https://www.douban.com/group/topic/{tid}/", topic_text))
    return pages


# ------------------------------------------------------------------
# assembly
# ------------------------------------------------------------------

_EPOCH_2024 = pd.Timestamp("2024-01-01T00:00:00")


def _rows_to_pdf(rows: list[tuple[str, str]], seed: int) -> pd.DataFrame:
    urls, canons, tss, htmls, texts, langs = [], [], [], [], [], []
    for url, text in rows:
        urls.append(url)
        canons.append(canonicalize_url(url))
        h = _mix(seed, len(url), sum(map(ord, url[:16])))
        tss.append(_EPOCH_2024 + pd.Timedelta(seconds=h % (365 * 86400)))
        htmls.append(text.encode("utf-8"))
        texts.append(text)
        langs.append("zh" if any(ord(c) > 0x2E80 for c in text[:400]) else "en")
    return pd.DataFrame(
        {
            "url": urls,
            "canon_url": canons,
            "warc_ts": tss,
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def build_corpus_pdf(
    seed: int = 42,
    n_generic: int = 200,
    n_hosts: int = 10,
    out_degree: int = 8,
    n_lists: int = 6,
    books_per_list: int = 5,
    n_topics: int = 8,
) -> pd.DataFrame:
    """Small driver-side corpus (tests / oracle)."""
    rows = douban_pages(seed, n_lists, books_per_list, n_topics)
    rows += [
        (generic_url(seed, i, n_hosts), generic_page_text(seed, i, n_generic, n_hosts, out_degree))
        for i in range(n_generic)
    ]
    return _rows_to_pdf(rows, seed)


def build_corpus_df(
    spark: SparkSession,
    seed: int = 42,
    n_generic: int = 200,
    n_hosts: int = 10,
    out_degree: int = 8,
    include_douban: bool = True,
    num_partitions: int | None = None,
    filler_kb: int = 0,
) -> DataFrame:
    """Distributed corpus: generate partition-locally via mapInPandas.

    This is the 100 TB path — each task synthesizes its own id range;
    no driver materialization, no shuffle.
    """
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = [
                (
                    generic_url(seed, i, n_hosts),
                    generic_page_text(seed, i, n_generic, n_hosts, out_degree,
                                      filler_kb=filler_kb),
                )
                for i in ids
            ]
            yield _rows_to_pdf(rows, seed)

    df = (
        spark.range(0, n_generic, numPartitions=num_partitions)
        .mapInPandas(gen, CORPUS_SCHEMA)
    )
    if include_douban:
        douban = spark.createDataFrame(_rows_to_pdf(douban_pages(seed), seed), CORPUS_SCHEMA)
        df = df.unionByName(douban)
    return df
