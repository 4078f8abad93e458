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
import warnings

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

# conservative Java/Python-agreeing pattern subset: literals, char
# classes, wildcards, greedy/lazy quantifiers, groups. No backrefs, no
# inline flags, no lookaround, no anchors (multiline $ drift), no
# alternation — anything outside the allowlist falls back to the
# shared-Python UDF. Beyond the token scan, divergence corners are
# rejected individually (see _pattern_jvm_safe / _class_body_jvm_safe):
#   - bare \d \s \w \D \S \W: Python re is Unicode-aware, Java ASCII
#     (without (?U)) — a non-ASCII-digit page would split the paths.
#     Allowed ONLY as a whole match-all class pair ([\d\D] etc), where
#     union-of-complement is "every char" in both engines.
#   - '&&' inside a class: Java intersection, Python two literal '&'.
#   - unescaped '[' inside a class: Java nested-class union, Python a
#     literal '[' (both compile — the runtime gate can't catch it).
#   - '{': only well-formed {m} {m,} {m,n} quantifiers (both engines
#     agree); Java throws on dangling '{x}' where Python reads literals.
#   - group 1 must exist and must not be optional ((g)?, (g)*, (g){0,…}
#     or an optional enclosing group): a non-participating group yields
#     "" from regexp_extract_all but None→TypeError in parse_page.
# The '.' newline gap (Java '.' also excludes CR, U+0085, U+2028, U+2029)
# is closed by compiling with (?d) UNIX_LINES — see _jvm_pattern.
_JVM_SAFE_TOKEN = re.compile(
    r"""
    \[(?:\\.|[^\]\\])*\]          # character class (body checked separately)
  | \\[\\.+*?()\[\]{}|^$/"']     # escaped metachar
  | \{\d+(?:,\d*)?\}             # well-formed quantifier {m} {m,} {m,n}
  | [^\\\[\]()^$|{]              # plain char (incl. . + * ? } digits)
  | \(\?:                         # non-capturing group open
  | \((?!\?)                      # capturing group open — any other (?…
                                  # construct (flags, lookaround, named
                                  # groups) is rejected
  | \)                            # group close
    """,
    re.VERBOSE,
)

# [\d\D] / [\s\S] / [\w\W] (either order): class ∪ complement is every
# char in both engines regardless of the Unicode/ASCII split
_MATCH_ALL_CLASS_BODIES = frozenset(
    a + b for a, b in ((r"\d", r"\D"), (r"\s", r"\S"), (r"\w", r"\W"))
) | frozenset(
    b + a for a, b in ((r"\d", r"\D"), (r"\s", r"\S"), (r"\w", r"\W"))
)

_PREDEFINED_ESCAPES = frozenset((r"\d", r"\D", r"\s", r"\S", r"\w", r"\W"))


def _class_body_jvm_safe(body: str) -> bool:
    """Validate one character-class body (between [ and ])."""
    inner = body[1:] if body.startswith("^") else body
    if inner in _MATCH_ALL_CLASS_BODIES:
        return True
    pos, prev_amp = 0, False
    while pos < len(inner):
        ch = inner[pos]
        if ch == "\\":
            if pos + 1 >= len(inner):
                return False
            if inner[pos : pos + 2] in _PREDEFINED_ESCAPES:
                return False  # Unicode(Python) vs ASCII(Java) drift
            pos += 2
            prev_amp = False
            continue
        if ch == "[":
            return False  # Java nested-class union vs Python literal
        if ch == "&" and prev_amp:
            return False  # Java intersection vs Python literals
        prev_amp = ch == "&"
        pos += 1
    return True


_OPTIONAL_QUANT_AFTER = re.compile(r"[?*]|\{0[,}]")


def _pattern_jvm_safe(pattern: str) -> bool:
    try:
        with warnings.catch_warnings():
            # e.g. FutureWarning for '&&' in classes we reject anyway
            warnings.simplefilter("ignore")
            re.compile(pattern)
    except re.error:
        return False  # broken everywhere — crash on the oracle path too
    pos = 0
    ncap = 0
    open_stack: list[bool] = []  # per open group: encloses-or-is group 1
    while pos < len(pattern):
        m = _JVM_SAFE_TOKEN.match(pattern, pos)
        if m is None:
            return False
        tok = m.group(0)
        if tok.startswith("[") and tok.endswith("]") and len(tok) >= 2:
            if not _class_body_jvm_safe(tok[1:-1]):
                return False
        elif tok == "(?:":
            open_stack.append(False)
        elif tok == "(":
            ncap += 1
            if ncap == 1:
                # every group already open encloses group 1
                open_stack = [True] * len(open_stack)
            open_stack.append(ncap == 1)
        elif tok == ")":
            if not open_stack:
                return False
            if open_stack.pop() and _OPTIONAL_QUANT_AFTER.match(
                pattern, m.end()
            ):
                return False  # group 1 could fail to participate
        pos = m.end()
    # parse_page reads m.group(1): require it, balanced groups
    return not open_stack and ncap >= 1


def _jvm_pattern(pattern: str) -> str:
    """The Java-side compiled form: (?d) UNIX_LINES makes Java's '.'
    exclude only \\n — Python re's behavior — instead of Java's default
    \\n \\r \\u0085 \\u2028 \\u2029 set. Anchors (the other UNIX_LINES
    surface) are rejected by the allowlist, so the flag only touches
    '.'."""
    return "(?d)" + pattern


# plan-time JVM compile gate: a pattern Python accepts but Java rejects
# (or that regexp_extract_all would die on) must fall back to the UDF
# gracefully instead of throwing PatternSyntaxException inside an
# executor mid-job. Cached per pattern; checked on the driver JVM.
_jvm_compile_cache: dict[str, bool] = {}


def _jvm_compiles(pattern: str) -> bool:
    cached = _jvm_compile_cache.get(pattern)
    if cached is not None:
        return cached
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        # no JVM to ask (e.g. pure-Python config validation before the
        # session exists): trust the static allowlist, don't cache —
        # _parse_plan always runs with an active session so the real
        # engine path is always gated.
        return True
    try:
        spark._jvm.java.util.regex.Pattern.compile(pattern)  # noqa: SLF001
        ok = True
    except Exception:
        ok = False
    _jvm_compile_cache[pattern] = ok
    return ok


def jvm_expressible(spec: RuleSpec) -> bool:
    """True if this rule can run as a codegen expression with byte-
    identical output to ``parse_page``."""
    return bool(
        spec.link_regex
        and not spec.temp_key
        and not spec.item_fields
        and not spec.match_regex
        and _pattern_jvm_safe(spec.link_regex)
        and _jvm_compiles(_jvm_pattern(spec.link_regex))
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
    links = F.regexp_extract_all(
        text_col, F.lit(_jvm_pattern(spec.link_regex)), F.lit(1)
    )
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
