"""Golden extraction tests — byte-identical with the reference regexes.

Each case mirrors a Go rule function:
- ParseTag        parse/doubanbook/parsebook.go:45-63
- ParseBookList   parse/doubanbook/parsebook.go:65-88
- ParseBookDetail parse/doubanbook/parsebook.go:97-124 (ExtractStr: ""
  on miss; strconv.Atoi: 0 on non-int, parsebook.go:99,117-124)
- ParseURL        parse/doubangroup/parseurl.go:36-59
- GetSunRoom      parse/doubangroup/parseurl.go:61-78
"""

import json

from pyspark.sql import functions as F

from crawler_spark.functions.parse import go_atoi, parse_page
from crawler_spark.rules import (
    RULE_BOOK_DETAIL,
    RULE_BOOK_LIST,
    RULE_GROUP_URL,
    RULE_SUN_ROOM,
    RULE_TAG,
)

DETAIL_HTML = (
    "<html><body>"
    '<span class="pl"> 作者</span>:\n <a href="/a/1">鲁迅</a>\n'
    '<span class="pl">出版社:</span>\n<a href="/p/2">人民文学出版社</a><br/>\n'
    '<span class="pl">页数:</span> 254<br/>\n'
    '<span class="pl">定价:</span>39.00元<br/>\n'
    '<strong class="ll rating_num " property="v:average">9.2</strong>\n'
    '<div class="intro"><h2>简介</h2><p>一本好书。</p></div>'
    "</body></html>"
)


def test_go_atoi():
    assert go_atoi("254") == 254
    assert go_atoi("-3") == -3
    assert go_atoi("+7") == 7
    assert go_atoi("") == 0
    assert go_atoi(" 254") == 0  # Atoi rejects spaces
    assert go_atoi("254页") == 0
    assert go_atoi("12.5") == 0


def test_parse_tag_links():
    html = (
        '<a href="/tag/小说" class="tag">小说</a> junk '
        '<a href="/tag/历史?b=2&a=1" class="tag">历史</a>'
        '<a href="/other" class="nottag">x</a>'
    )
    reqs, items = parse_page(RULE_TAG, "https://book.douban.com", html, {})
    assert [r["url"] for r in reqs] == [
        "https://book.douban.com/tag/小说",
        "https://book.douban.com/tag/历史?b=2&a=1",
    ]
    assert all(r["rule"] == "书籍列表" and r["priority"] == 0 for r in reqs)
    assert items == []


def test_parse_book_list_carries_title():
    html = (
        '<li><a class="x" href="https://book.douban.com/subject/1/"'
        ' title="活着">活着</a></li>'
        '<li><a href="https://book.douban.com/subject/2/" title="围城">围城</a></li>'
    )
    reqs, _ = parse_page(RULE_BOOK_LIST, "u", html, {})
    assert [r["url"] for r in reqs] == [
        "https://book.douban.com/subject/1/",
        "https://book.douban.com/subject/2/",
    ]
    assert [r["temp"]["book_name"] for r in reqs] == ["活着", "围城"]
    assert all(r["priority"] == 100 and r["rule"] == "书籍简介" for r in reqs)


def test_parse_book_detail_golden():
    _, items = parse_page(
        RULE_BOOK_DETAIL, "u", DETAIL_HTML, {"book_name": "呐喊"}
    )
    assert items == [
        {
            "书名": "呐喊",
            "作者": "鲁迅",
            "页数": "254",
            "出版社": "人民文学出版社",
            "得分": "9.2",
            "价格": "39.00元",
            "简介": "一本好书。",
        }
    ]


def test_parse_book_detail_missing_fields():
    _, items = parse_page(RULE_BOOK_DETAIL, "u", "<html></html>", {})
    assert items == [
        {"书名": "", "作者": "", "页数": "0", "出版社": "", "得分": "", "价格": "", "简介": ""}
    ]


def test_parse_book_detail_nonnumeric_pages():
    html = '<span class="pl">页数:</span> about 300<br/>'
    _, items = parse_page(RULE_BOOK_DETAIL, "u", html, {})
    assert items[0]["页数"] == "0"  # strconv.Atoi failure → 0


def test_parse_group_urls_reload():
    html = (
        '<a href="x" ...>skip</a>'
        '(<a target="_blank" href="https://www.douban.com/group/topic/27abc3/"'
        ' title="t">阳台房出租</a>)'
    )
    # the Go pattern matches the URL itself (group 1) wherever it
    # appears followed by `"[^>]*>text</a>`
    reqs, _ = parse_page(RULE_GROUP_URL, "u", html, {})
    assert reqs == [
        {
            "url": "https://www.douban.com/group/topic/27abc3/",
            "rule": "解析阳台房",
            "priority": 0,
            "reload": True,
            "temp": {},
            "match_index": 0,
        }
    ]


def test_sun_room_match_and_miss():
    yes = '<div class="topic-content"><p>大阳台朝南</p><div class="x">'
    no = '<div class="topic-content"><p>没有窗</p><div class="x">'
    _, items = parse_page(RULE_SUN_ROOM, "https://t/1", yes, {})
    assert items == [{"match_url": "https://t/1"}]
    _, items = parse_page(RULE_SUN_ROOM, "https://t/1", no, {})
    assert items == []


def test_spark_parse_udf_matches_pure_python(spark):
    """The Arrow UDF path must produce exactly what parse_page does."""
    from pyspark.sql import functions as F

    from crawler_spark.functions.parse import make_parse_udf

    rows = [
        ("数据tag", "https://book.douban.com", '<a href="/tag/小说" class="tag">小说</a>', None),
        ("书籍简介", "https://b/1", DETAIL_HTML, json.dumps({"book_name": "呐喊"})),
        ("解析阳台房", "https://t/1", '<div class="topic-content">阳台<div', None),
    ]
    df = spark.createDataFrame(rows, "rule string, url string, text string, temp string")
    rule_map = {r.name: r for r in [RULE_TAG, RULE_BOOK_DETAIL, RULE_SUN_ROOM]}
    udf = make_parse_udf(rule_map)
    out = df.withColumn(
        "parsed", udf(F.col("rule"), F.col("url"), F.col("text"), F.col("temp"))
    ).collect()
    for row in out:
        spec = rule_map[row.rule]
        temp = json.loads(row.temp) if row.temp else {}
        exp_reqs, exp_items = parse_page(spec, row.url, row.text, temp)
        got_reqs = [r.asDict() for r in row.parsed.requests]
        for g in got_reqs:
            g["temp"] = json.loads(g["temp"])
        assert got_reqs == exp_reqs
        assert [json.loads(s) for s in row.parsed.items] == exp_items


# ------------------------------------------------------------------
# JVM codegen fast path (functions/parse.py:jvm_parsed_expr)
# ------------------------------------------------------------------

def test_jvm_expressible_classification():
    from crawler_spark.functions.parse import jvm_expressible
    from crawler_spark.rules import RULE_BOOK_LIST, RULE_GROUP_URL, RULE_SUN_ROOM
    from crawler_spark.sources.corpus import GENERIC_RULE

    # link-only rules compile; temp-carry / item / boolean-match rules
    # must stay on the shared-Python executable-spec path
    assert jvm_expressible(GENERIC_RULE)
    assert jvm_expressible(RULE_TAG)
    assert not jvm_expressible(RULE_BOOK_LIST)  # temp_key carry
    assert not jvm_expressible(RULE_BOOK_DETAIL)  # item fields
    assert not jvm_expressible(RULE_SUN_ROOM)  # boolean match
    # 2-group link rule without temp carry: group 2 is unused by
    # parse_page, so it compiles too (reload flag rides along)
    assert jvm_expressible(RULE_GROUP_URL)


def test_pattern_jvm_safe_allowlist():
    from crawler_spark.functions.parse import _pattern_jvm_safe

    for p in (
        r'<a href="([^"]+)" class="link">',
        r'<a href="([^"]+)" class="tag">([^<]+)</a>',
        r'<a.*?href="([^"]+)" title="([^"]+)"',
        r"(https://www.douban.com/group/topic/[0-9a-z]+/)",
        r"<span>[\d\D]*?<a.*?>([^<]+)</a>",
    ):
        assert _pattern_jvm_safe(p), p
    for p in (
        r"(a)\1",          # backref
        r"(?i)case",       # inline flag
        r"(?=look)ahead",  # lookaround
        r"^anchor$",       # anchors (multiline drift)
        r"a|b",            # top-level alternation kept off the allowlist
        r"id=(\d+)",       # bare \d: Python Unicode digits vs Java ASCII
        r"x(\s+)y",        # bare \s: same Unicode/ASCII split
        r"[a&&b](c)",      # Java class intersection vs Python literals
        r"[a[b]c](d)",     # Java nested-class union vs Python literal '['
        r"a{x}(b)",        # dangling brace: Java PatternSyntaxException
        r"a{,5}(b)",       # {,n}: Python quantifier, Java error
        r"(x)?y",          # optional group 1 → "" (JVM) vs None (spec)
        r"(x)*y",          # same
        r"(x){0,3}y",      # same
        r"(?:(x))?a",      # optional ENCLOSING group → same gap
        r"nogroup",        # parse_page reads m.group(1): must exist
        r"(a)(b",          # unbalanced group
    ):
        assert not _pattern_jvm_safe(p), p
    # quantified-but-participating groups and well-formed braces stay in
    for p in (r"(x)+y", r"(x){1,3}y", r"a{2}([^<]+)", r"(?:ab)+(c)"):
        assert _pattern_jvm_safe(p), p


def test_jvm_compile_gate(spark):
    """Patterns Java rejects at compile time must fail the runtime gate
    (→ graceful UDF fallback), never PatternSyntaxException mid-job."""
    from crawler_spark.functions.parse import _jvm_compiles

    assert _jvm_compiles(r"(?d)abc([^<]+)")
    assert not _jvm_compiles(r"(?d)a{x}(b)[")


def test_jvm_dot_matches_python_on_exotic_newlines(spark):
    """Java's default '.' excludes \\r \\u0085 \\u2028 \\u2029 that
    Python's '.' matches; the (?d) UNIX_LINES compile flag closes the
    gap. Pin byte-identical output on pages containing each of them,
    plus CRLF line endings (ADVICE r2, high)."""
    from crawler_spark.config import RuleSpec
    from crawler_spark.functions.parse import (
        jvm_expressible,
        jvm_parsed_expr,
        parse_page,
    )

    spec = RuleSpec(
        name="dot", link_regex=r'<a.*?href="([^"]+)">', next_rule="dot"
    )
    assert jvm_expressible(spec)
    texts = [
        '<a x="1"\rhref="/cr">',          # \r inside the .*? span
        '<a x="1"\r\nhref="/crlf">',      # CRLF
        '<a x="1"\u0085href="/nel">',    # NEL
        '<a x="1"\u2028href="/ls">',     # LINE SEPARATOR
        '<a x="1"\u2029href="/ps">',     # PARAGRAPH SEPARATOR
        '<a x="1"\nhref="/lf">',          # \n: NO match in either engine
        '<a x="1" href="/plain">',
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(jvm_parsed_expr(spec, F.col("text")).alias("p")).collect()
    matched_any = False
    for t, row in zip(texts, got):
        exp_reqs, _ = parse_page(spec, "http://req", t, {})
        assert [r.url for r in row.p.requests] == [r["url"] for r in exp_reqs], t
        matched_any = matched_any or bool(exp_reqs)
    assert matched_any  # the exotic-newline pages really do match


def test_jvm_parsed_expr_equals_parse_page(spark):
    """The codegen expression is byte-identical to parse_page for every
    expressible rule over goldens, generated pages, and edge cases."""
    from crawler_spark.functions.parse import jvm_expressible, jvm_parsed_expr
    from crawler_spark.sources.corpus import GENERIC_RULE, generic_page_text

    texts = [generic_page_text(7, i, 300, 8, out_degree=5, filler_kb=1)
             for i in range(150)]
    texts += [
        '<a href="/x" class="tag">a</a> mid <a href="/y" class="tag">b</a>',
        '<a href="/only" class="link">',
        "",
        None,
        "no anchors at all",
        '<a href="" class="link">',  # empty group can't match [^"]+
        '<a href="/dup" class="link"><a href="/dup" class="link">',
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for spec in (GENERIC_RULE, RULE_TAG):
        assert jvm_expressible(spec)
        got = df.select(jvm_parsed_expr(spec, F.col("text")).alias("p")).collect()
        for t, row in zip(texts, got):
            exp_reqs, exp_items = ([], []) if t is None else parse_page(
                spec, "http://req", t, {}
            )
            got_reqs = [r.asDict() for r in row.p.requests]
            for g in got_reqs:
                g["temp"] = json.loads(g["temp"])
            assert got_reqs == exp_reqs, (spec.name, t)
            assert list(row.p.items) == [] and exp_items == []
