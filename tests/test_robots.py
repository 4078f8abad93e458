"""robots.txt enforcement: engine and oracle agree; longest-prefix
semantics."""

from crawler_spark.config import EngineConfig
from crawler_spark.plans.frontier import FrontierEngine
from crawler_spark.plans.oracle import GoOracle, robots_allowed
from crawler_spark.sources.corpus import CORPUS_SCHEMA, build_corpus_pdf, generic_task


def test_path_of_matches_oracle(spark):
    """Engine path extraction must split on the FIRST '://' exactly
    like oracle._path_of — URLs embedding URLs in the query were
    mis-split by substring_index(…, -1) (ADVICE r1)."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.robots import path_of
    from crawler_spark.plans.oracle import _path_of

    urls = [
        "https://a.com/r?u=http://b.com/x",
        "https://a.com/r?u=https://b.com",
        "https://a.com",
        "https://a.com/",
        "http://a.com/p/q?x=1",
        "noscheme.example/path",
        "noscheme.example",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.url: r.p
        for r in df.select("url", path_of(F.col("url")).alias("p")).collect()
    }
    for u in urls:
        assert got[u] == _path_of(u), f"{u}: {got[u]} != {_path_of(u)}"


def test_longest_prefix_wins():
    rules = [
        ("h.com", "/", False),
        ("h.com", "/public", True),
        ("h.com", "/public/private", False),
    ]
    assert not robots_allowed(rules, "h.com", "/x")
    assert robots_allowed(rules, "h.com", "/public/a")
    assert not robots_allowed(rules, "h.com", "/public/private/a")
    assert robots_allowed(rules, "other.com", "/x")  # default allow


def test_engine_matches_oracle_with_robots(spark, workdir):
    pdf = build_corpus_pdf(
        seed=42, n_generic=60, n_hosts=5, out_degree=4,
        n_lists=0, books_per_list=0, n_topics=0,
    )
    # block one entire host, default-allow the rest
    rules = [("www.site0002.example", "/", False)]
    corpus = spark.createDataFrame(pdf, CORPUS_SCHEMA)
    robots_df = spark.createDataFrame(
        rules, "host string, path_prefix string, allow boolean"
    )
    cfg = EngineConfig(
        batch_size=8, num_partitions=4, use_bloom=False, max_rounds=20
    )
    tasks = [generic_task(max_depth=3)]
    eng = FrontierEngine(
        spark, tasks, corpus, cfg, robots=robots_df, workdir=workdir
    )
    eng.run(max_rounds=20)
    oracle = GoOracle(
        tasks,
        dict(zip(pdf["canon_url"], pdf["text"])),
        batch_size=8,
        robots=rules,
        max_rounds=20,
    ).run()
    got = [(r["round"], r.url) for r in eng.read_order().collect()]
    exp = [(o["round"], o["url"]) for o in oracle.crawl_order]
    assert got == exp
    assert {r.url_hash for r in eng.read_seen().collect()} == oracle.seen
    # the blocked host was never fetched
    assert all("site0002" not in u for _, u in got)
    assert len(oracle.robots_denied) > 0


def test_equal_length_tie_first_rule_wins(spark):
    """Among equal-length matching prefixes the FIRST rule in input
    order wins (oracle robots_allowed uses strict '>'): round 2's
    max_by left this to chance."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.robots import filter_robots_allowed

    rules = [
        ("h.com", "/a", False),  # first: deny
        ("h.com", "/a", True),   # same length: must lose
        ("h.com", "/bb", True),
        ("h.com", "/bb", False),
    ]
    assert not robots_allowed(rules, "h.com", "/a/x")
    assert robots_allowed(rules, "h.com", "/bb/x")
    robots_df = spark.createDataFrame(
        rules, "host string, path_prefix string, allow boolean"
    )
    frontier = spark.createDataFrame(
        [("h.com", "http://h.com/a/x"), ("h.com", "http://h.com/bb/x")],
        "host string, canon_url string",
    )
    got = sorted(
        r.canon_url
        for r in filter_robots_allowed(frontier, robots_df).collect()
    )
    assert got == ["http://h.com/bb/x"]


def test_robots_filter_plan_has_no_shuffle(spark):
    """The decision must be broadcast-join + codegen fold: zero
    Exchange introduced on the frontier side (VERDICT r2 #2)."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.robots import filter_robots_allowed, prepare_robots

    robots_df = spark.createDataFrame(
        [("h.com", "/deny", False)],
        "host string, path_prefix string, allow boolean",
    )
    prepped = prepare_robots(robots_df)
    frontier = spark.range(100).select(
        F.concat(F.lit("h"), (F.col("id") % 3).cast("string"), F.lit(".com"))
        .alias("host"),
        F.concat(F.lit("http://h.com/p/"), F.col("id").cast("string"))
        .alias("canon_url"),
    )
    out = filter_robots_allowed(frontier, prepped)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan
    assert out.count() == 100


def test_explicit_rule_order_overrides_physical_order(spark):
    """ADVICE r3: collect() order is partition order, so a shuffled or
    file-backed rule table must carry a ``rule_order`` column; the
    oracle's first-rule-in-input-order tie-break follows it, not the
    physical row order."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.robots import filter_robots_allowed

    rules_in_order = [
        ("h.com", "/a", False, 0),  # first in input order: deny wins
        ("h.com", "/a", True, 1),
    ]
    # physically REVERSED relative to rule_order
    robots_df = spark.createDataFrame(
        list(reversed(rules_in_order)),
        "host string, path_prefix string, allow boolean, rule_order int",
    ).coalesce(1)
    frontier = spark.createDataFrame(
        [("h.com", "http://h.com/a/x")], "host string, canon_url string"
    )
    assert filter_robots_allowed(frontier, robots_df).count() == 0
    # same table without rule_order follows physical order → allow wins
    no_order = robots_df.drop("rule_order")
    assert filter_robots_allowed(frontier, no_order).count() == 1


# ---------- property fuzz: Spark plan == executable spec ----------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_HOSTS = ["h.com", "x.example", "bücher.example", "h.com:8080", "a-b.c"]
_PREFIXES = ["", "/", "/a", "/a/b", "/pub", "/üni", "/r?u=http://b.com", "?q"]
_PATHS = [
    "", "/", "/x", "/a/b/c", "/pub/x", "/üni/page",
    "/r?u=http://b.com/x", "/r?u=https://b.com", "?q=1", "/a?x=1&y=2",
    "//double/slash", "/a#frag",
]
_SCHEMES = ["http://", "https://", ""]


@st.composite
def _robots_case(draw):
    rules = draw(
        st.lists(
            st.tuples(
                st.sampled_from(_HOSTS),
                st.sampled_from(_PREFIXES),
                st.booleans(),
            ),
            max_size=8,
        )
    )
    reqs = draw(
        st.lists(
            st.tuples(
                st.sampled_from(_HOSTS),
                st.sampled_from(_SCHEMES),
                st.sampled_from(_PATHS),
            ),
            min_size=1,
            max_size=20,
        )
    )
    return rules, reqs


@given(_robots_case())
@settings(max_examples=15, deadline=None)
def test_filter_matches_oracle_fuzzed(spark, case):
    """filter_robots_allowed (broadcast join + codegen longest-prefix
    fold + path_of) must agree with plans/oracle.robots_allowed over
    fuzzed URLs: embedded URLs, ports, empty/unicode paths and hosts
    (VERDICT r3 #8)."""
    from crawler_spark.operators.robots import filter_robots_allowed
    from crawler_spark.plans.oracle import _path_of

    rules, reqs = case
    urls = [
        (i, host, f"{scheme}{host}{path}")
        for i, (host, scheme, path) in enumerate(reqs)
    ]
    frontier = spark.createDataFrame(
        urls, "rid int, host string, canon_url string"
    )
    robots_df = spark.createDataFrame(
        [(h, p, a, i) for i, (h, p, a) in enumerate(rules)],
        "host string, path_prefix string, allow boolean, rule_order int",
    )
    got = {
        r.rid for r in filter_robots_allowed(frontier, robots_df).collect()
    }
    exp = {
        i for i, host, url in urls if robots_allowed(rules, host, _path_of(url))
    }
    assert got == exp, (rules, urls, got ^ exp)
