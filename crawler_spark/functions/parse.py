"""Vectorized page parsing: the reference's regex rules as one Arrow UDF.

The reference dispatches each fetched page to a per-rule Go function
(engine/schedule.go:286-293) that does row-at-a-time regex work
(parse/doubanbook/parsebook.go:45-124, parse/doubangroup/
parseurl.go:36-78). Here every rule is a ``RuleSpec`` (data, not code)
and ONE pandas UDF interprets all rules over an Arrow batch of pages,
returning ``struct<requests: array<struct<...>>, items:
array<map<string,string>>>`` which the frontier loop explodes.

Byte-identical-extraction contract (BASELINE.json input_hint): for the
reference's patterns the Go RE2 and Python ``re`` engines agree —
the patterns use no alternation/backreferences, `.` excludes newline
in both, and `[\\d\\D]`/`[\\s\\S]` match-all classes behave
identically; golden tests pin this (tests/test_rules.py).

Int-field semantics replicate Go ``strconv.Atoi`` (parsebook.go:99):
optional sign + decimal digits only, anything else → 0; the stored
value is the JSON-marshalled int (sqlstorage.go:100-115) i.e. its
base-10 string.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from crawler_spark.config import RuleSpec

# \Z, not $: Python's $ also matches before a trailing newline, which
# would accept "1\n" — Go's strconv.Atoi (parsebook.go Atoi call
# sites) rejects any whitespace.
_ATOI_RE = re.compile(r"^[+-]?[0-9]+\Z")

# ``temp`` and item payloads travel as JSON strings (stable Arrow
# roundtrip; the Go TempData is map[string]interface{} serialized the
# same way on flush, sqlstorage.go:100-115).
REQUEST_EMIT_TYPE = StructType(
    [
        StructField("url", StringType()),
        StructField("rule", StringType()),
        StructField("priority", IntegerType()),
        StructField("reload", BooleanType()),
        StructField("temp", StringType()),
        StructField("match_index", IntegerType()),
    ]
)

PARSE_RESULT_TYPE = StructType(
    [
        StructField("requests", ArrayType(REQUEST_EMIT_TYPE)),
        StructField("items", ArrayType(StringType())),
    ]
)


def go_atoi(s: str) -> int:
    """Go strconv.Atoi with the reference's error-swallowing (→0)."""
    return int(s) if _ATOI_RE.match(s) else 0


def parse_page(spec: RuleSpec, url: str, text: str, temp: dict | None):
    """Parse one page under one rule. Pure-Python core shared by the
    Spark UDF and the Go-oracle simulator (plans/oracle.py) so engine
    and oracle cannot drift."""
    requests: list[dict] = []
    items: list[dict] = []
    temp = temp or {}
    if spec.link_regex:
        for i, m in enumerate(re.finditer(spec.link_regex, text)):
            child_temp = {}
            if spec.temp_key and m.lastindex and m.lastindex >= 2:
                child_temp[spec.temp_key] = m.group(2)
            requests.append(
                {
                    "url": spec.url_prefix + m.group(1),
                    "rule": spec.next_rule,
                    "priority": spec.next_priority,
                    "reload": spec.emit_reload,
                    "temp": child_temp,
                    "match_index": i,
                }
            )
    if spec.item_fields:
        item: dict[str, str] = {}
        for fld in spec.item_fields:
            if fld in spec.temp_fields:
                item[fld] = temp.get(spec.temp_fields[fld], "")
            else:
                pattern = spec.field_regexes.get(fld, "")
                m = re.search(pattern, text) if pattern else None
                val = m.group(1) if (m and m.lastindex) else ""
                if fld in spec.int_fields:
                    val = str(go_atoi(val))
                item[fld] = val
        items.append(item)
    if spec.match_regex:
        if re.search(spec.match_regex, text):
            # reference GetSunRoom emits the request URL itself as the
            # item (parseurl.go:72-77); keyed "match_url" so it cannot
            # collide with the envelope's url field
            items.append({"match_url": url})
    return requests, items


def make_parse_udf(rule_map: dict[str, RuleSpec]):
    """Build the batch parse UDF for a task's rule registry.

    rule dispatch (reference engine/schedule.go:287-291) happens
    inside the batch — unknown rule → empty result (the Go engine
    logs and skips, schedule.go:288-290).
    """

    @pandas_udf(PARSE_RESULT_TYPE)
    def parse_udf(
        rules: pd.Series, urls: pd.Series, texts: pd.Series, temps: pd.Series
    ) -> pd.DataFrame:
        out_requests, out_items = [], []
        for rule, url, text, temp_json in zip(rules, urls, texts, temps):
            spec = rule_map.get(rule)
            if spec is None or text is None:
                out_requests.append([])
                out_items.append([])
                continue
            temp = json.loads(temp_json) if temp_json else {}
            reqs, items = parse_page(spec, url, text, temp)
            for r in reqs:
                r["temp"] = json.dumps(r["temp"], ensure_ascii=False, sort_keys=True)
            out_requests.append(reqs)
            out_items.append(
                [json.dumps(it, ensure_ascii=False, sort_keys=True) for it in items]
            )
        return pd.DataFrame({"requests": out_requests, "items": out_items})

    return parse_udf


def apply_parse(df, rule_map: dict[str, RuleSpec], text_col: str = "text"):
    """Attach a ``parsed`` struct column to a batch of fetched pages."""
    udf = make_parse_udf(rule_map)
    return df.withColumn(
        "parsed", udf(F.col("rule"), F.col("url"), F.col(text_col), F.col("temp"))
    )


# ------------------------------------------------------------------
# JVM codegen fast path for link-only rules
# ------------------------------------------------------------------
# The Arrow UDF is the slow path: page bodies (the dominant bytes) are
# serialized to Python workers every round, and Python-worker compute
# amplifies under multi-core concurrency. A rule that only extracts
# links — no temp carry, no item fields, no boolean match — is a pure
# regex map, which Spark's `regexp_extract_all` + `transform` express
# entirely inside whole-stage codegen: zero Arrow crossings for those
# pages. The compiled expression is pinned equal to ``parse_page`` by
# tests/test_rules.py (randomized corpora, both paths) AND by every
# engine-vs-oracle suite (the oracle interprets parse_page; the engine
# runs this expression for eligible rules by default).

# conservative Java/Python/Go-RE2-agreeing pattern subset: literals,
# char classes ([...] incl. \d \D \s \S \w \W), wildcards, greedy/lazy
# quantifiers, groups. No backrefs, no inline flags, no lookaround, no
# anchors (multiline $ drift), no alternation-with-anchors corners —
# anything outside the allowlist falls back to the shared-Python UDF.
_JVM_SAFE_TOKEN = re.compile(
    r"""
    \[(?:\\.|[^\]\\])*\]          # character class
  | \\[dDsSwW]                    # predefined classes
  | \\[\\.+*?()\[\]{}|^$/"']     # escaped metachar
  | [^\\\[\]()^$|]               # plain char (incl. . + * ? { } digits)
  | \(\?:                         # non-capturing group open
  | \((?!\?)                      # capturing group open — any other (?…
                                  # construct (flags, lookaround, named
                                  # groups) is rejected
  | \)                            # group close
    """,
    re.VERBOSE,
)


def _pattern_jvm_safe(pattern: str) -> bool:
    pos = 0
    while pos < len(pattern):
        m = _JVM_SAFE_TOKEN.match(pattern, pos)
        if m is None:
            return False
        pos = m.end()
    return True


def jvm_expressible(spec: RuleSpec) -> bool:
    """True if this rule can run as a codegen expression with byte-
    identical output to ``parse_page``."""
    return bool(
        spec.link_regex
        and not spec.temp_key
        and not spec.item_fields
        and not spec.match_regex
        and _pattern_jvm_safe(spec.link_regex)
    )


def jvm_parsed_expr(spec: RuleSpec, text_col):
    """The ``parsed`` struct (same schema as the UDF) for one
    link-only rule, as a pure JVM expression.

    Mirrors parse_page's link branch exactly: every non-overlapping
    leftmost match in document order, group 1 prefixed with
    ``url_prefix``, temp = "{}" (json.dumps of the empty carry),
    match_index = 0-based enumeration. Null body → empty result, like
    the UDF's ``text is None`` guard.
    """
    links = F.regexp_extract_all(text_col, F.lit(spec.link_regex), F.lit(1))
    reqs = F.transform(
        links,
        lambda x, i: F.struct(
            F.concat(F.lit(spec.url_prefix), x).alias("url"),
            F.lit(spec.next_rule).alias("rule"),
            F.lit(int(spec.next_priority)).cast("int").alias("priority"),
            F.lit(bool(spec.emit_reload)).alias("reload"),
            F.lit("{}").alias("temp"),
            i.cast("int").alias("match_index"),
        ),
    )
    empty = F.array().cast(ArrayType(REQUEST_EMIT_TYPE))
    no_items = F.array().cast(ArrayType(StringType()))
    return F.when(
        text_col.isNull(), F.struct(empty.alias("requests"), no_items.alias("items"))
    ).otherwise(F.struct(reqs.alias("requests"), no_items.alias("items")))
