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
