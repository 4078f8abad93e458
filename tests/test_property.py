"""Property-based tests (hypothesis) over the pure-Python core:
canonicalization, Atoi semantics, bloom guarantees, and Go-oracle
invariants on random small web graphs (SURVEY.md §5.6). No Spark —
these run fast and pin the executable spec the engine is tested
against."""

import hashlib
import string

from hypothesis import example, given, settings
from hypothesis import strategies as st

from crawler_spark.config import RuleSpec, TaskConfig
from crawler_spark.functions.parse import go_atoi
from crawler_spark.functions.urlnorm import canonicalize_url, host_of_url
from crawler_spark.operators.bloom import BloomFilter
from crawler_spark.plans.oracle import GoOracle, url_hash

# ---------- canonicalization ----------

hosts = st.from_regex(r"[A-Za-z][A-Za-z0-9.-]{0,20}", fullmatch=True)
paths = st.from_regex(r"(/[A-Za-z0-9_.~-]{0,8}){0,4}", fullmatch=True)
queries = st.lists(
    st.tuples(
        st.text(string.ascii_lowercase, min_size=1, max_size=4),
        st.text(string.ascii_lowercase + string.digits, max_size=4),
    ),
    max_size=4,
)
frags = st.one_of(st.just(""), st.from_regex(r"#[A-Za-z0-9]{0,6}", fullmatch=True))


@st.composite
def urls(draw):
    host = draw(hosts)
    scheme = draw(st.sampled_from(["http", "https"]))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    q = draw(queries)
    qs = "?" + "&".join(f"{k}={v}" for k, v in q) if q else ""
    return f"{scheme}://{host}{port}{draw(paths)}{qs}{draw(frags)}"


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    c = canonicalize_url(u)
    assert canonicalize_url(c) == c


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_invariants(u):
    c = canonicalize_url(u)
    assert "#" not in c  # fragment stripped
    host = host_of_url(c)
    assert host == host.lower()
    # canonical host equals original host lowercased
    assert host == host_of_url(u)


@given(urls(), frags)
@settings(max_examples=200, deadline=None)
def test_fragment_never_changes_identity(u, frag):
    base = u.split("#")[0]
    assert url_hash(canonicalize_url(base)) == url_hash(canonicalize_url(base + frag))


# ---------- go_atoi ----------


@given(st.integers(min_value=-(10**17), max_value=10**17))
def test_atoi_roundtrip(n):
    assert go_atoi(str(n)) == n


@given(st.text(max_size=10))
@settings(max_examples=300)
@example("1\n")  # $-anchor pitfall: Python $ matches before a trailing \n
def test_atoi_never_raises_matches_go(s):
    v = go_atoi(s)
    stripped = s
    is_go_int = (
        len(stripped) > 0
        and (stripped[0] in "+-" and stripped[1:].isdigit() or stripped.isdigit())
        and all(c in "0123456789+-" for c in stripped[:1])
        and stripped.lstrip("+-").isdigit()
        and stripped.count("+") + stripped.count("-") <= 1
        and (stripped[0] in "+-" or stripped.isdigit())
    )
    if not is_go_int:
        assert v == 0


# ---------- bloom ----------


@given(st.sets(st.text(string.hexdigits.lower(), min_size=1, max_size=40), max_size=200))
@settings(max_examples=100, deadline=None)
def test_bloom_never_false_negative(keys):
    bf = BloomFilter(capacity=max(len(keys), 8), fpp=0.01)
    bf.add_many(list(keys))
    assert all(bf.might_contain(k) for k in keys)


@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=100, unique=True))
@settings(max_examples=50, deadline=None)
def test_bloom_hex_and_fallback_paths_agree(ids):
    keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    a = BloomFilter(capacity=128, fpp=0.01)
    b = BloomFilter(capacity=128, fpp=0.01)
    a.add_many(keys)  # vectorized hex path
    for k in keys:
        b.add(k)  # scalar path
    assert bytes(a.to_bytes()) == bytes(b.to_bytes())


# ---------- oracle invariants on random graphs ----------


def _graph_corpus(n, edges, link_rule):
    """Build corpus dict url->text for a random digraph."""
    pages = {}
    for i in range(n):
        links = "\n".join(
            f'<a href="https://h{t % 5}.example/p/{t}" class="link">x</a>'
            for t in edges.get(i, [])
        )
        pages[f"https://h{i % 5}.example/p/{i}"] = f"<html>{links}</html>"
    return pages


@given(
    st.integers(min_value=2, max_value=25),
    st.data(),
)
@settings(max_examples=40, deadline=None)
def test_oracle_invariants_random_graph(n, data):
    edges = {
        i: data.draw(
            st.lists(st.integers(0, n + 2), max_size=4), label=f"edges{i}"
        )
        for i in range(n)
    }
    corpus = _graph_corpus(n, edges, "link")
    task = TaskConfig(
        name="t",
        seeds=(("https://h0.example/p/0", 1, "link"),),
        max_depth=data.draw(st.integers(1, 5), label="depth"),
        rules=(
            RuleSpec(
                name="link",
                link_regex=r'<a href="([^"]+)" class="link">',
                next_rule="link",
            ),
        ),
    )
    batch = data.draw(st.integers(1, 8), label="batch")
    budget = data.draw(st.one_of(st.none(), st.integers(1, 3)), label="budget")
    res = GoOracle([task], corpus, batch_size=batch, host_budget=budget,
                   max_rounds=200).run()
    # 1. each url fetched at most once... unless un-marked by reload
    # (no reload here) → crawl_order url_hashes are unique
    hashes = [o["url_hash"] for o in res.crawl_order]
    assert len(hashes) == len(set(hashes))
    # 2. seen == all attempted hashes (no reload ⇒ nothing un-marked)
    assert res.seen == set(hashes)
    # 3. failures ⊆ attempted, and every failure url is not in corpus
    for h, u in res.failures.items():
        assert h in res.seen
        from crawler_spark.functions.urlnorm import canonicalize_url as c

        assert c(u) not in corpus
    # 4. depth never exceeds max_depth
    assert all(o["depth"] <= task.max_depth for o in res.crawl_order)
    # 5. within a round, priority rows precede non-priority rows
    by_round = {}
    for o in res.crawl_order:
        by_round.setdefault(o["round"], []).append(o)
    for rows in by_round.values():
        classes = [0 if r["priority"] > 0 else 1 for r in rows]
        assert classes == sorted(classes)
    # 6. per-host per-round budget respected
    if budget is not None:
        for rows in by_round.values():
            per_host = {}
            for r in rows:
                per_host[r["host"]] = per_host.get(r["host"], 0) + 1
            assert all(v <= budget for v in per_host.values())
