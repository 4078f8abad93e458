"""The reference's two rule trees, expressed as RuleSpec data.

Patterns are copied *verbatim* from the reference constants — they are
the semantic contract (byte-identical extracted text per url):

- TagRe            parse/doubanbook/parsebook.go:43
- BookListRe       parse/doubanbook/parsebook.go:65
- author/public/page/price/score/intro regexes
                   parse/doubanbook/parsebook.go:90-95
- urlListRe        parse/doubangroup/parseurl.go:9
- ContentRe        parse/doubangroup/parseurl.go:61

Rule wiring (names, priorities, prefixes, temp carry, reload flags)
follows parsebook.go:15-88 and parseurl.go:11-59.
"""

from __future__ import annotations

from crawler_spark.config import RuleSpec, TaskConfig

TAG_RE = r'<a href="([^"]+)" class="tag">([^<]+)</a>'
BOOK_LIST_RE = r'<a.*?href="([^"]+)" title="([^"]+)"'
AUTHOR_RE = r'<span class="pl"> 作者</span>:[\d\D]*?<a.*?>([^<]+)</a>'
PUBLIC_RE = r'<span class="pl">出版社:</span>[\d\D]*?<a.*?>([^<]+)</a>'
PAGE_RE = r'<span class="pl">页数:</span> ([^<]+)<br/>'
PRICE_RE = r'<span class="pl">定价:</span>([^<]+)<br/>'
SCORE_RE = r'<strong class="ll rating_num " property="v:average">([^<]+)</strong>'
INTRO_RE = r'<div class="intro">[\d\D]*?<p>([^<]+)</p></div>'
URL_LIST_RE = r'(https://www.douban.com/group/topic/[0-9a-z]+/)"[^>]*>([^<]+)</a>'
CONTENT_RE = r'<div class="topic-content">[\s\S]*?阳台[\s\S]*?<div'

# --- douban_book_list task (parsebook.go:11-41) ---

RULE_TAG = RuleSpec(
    name="数据tag",
    link_regex=TAG_RE,
    url_prefix="https://book.douban.com",
    next_rule="书籍列表",
    next_priority=0,
)

RULE_BOOK_LIST = RuleSpec(
    name="书籍列表",
    link_regex=BOOK_LIST_RE,
    next_rule="书籍简介",
    next_priority=100,  # parsebook.go:74
    temp_key="book_name",  # parsebook.go:83-84
)

RULE_BOOK_DETAIL = RuleSpec(
    name="书籍简介",
    item_fields=("书名", "作者", "页数", "出版社", "得分", "价格", "简介"),
    field_regexes={
        "作者": AUTHOR_RE,
        "页数": PAGE_RE,
        "出版社": PUBLIC_RE,
        "得分": SCORE_RE,
        "价格": PRICE_RE,
        "简介": INTRO_RE,
    },
    int_fields=("页数",),  # strconv.Atoi, parsebook.go:99
    temp_fields={"书名": "book_name"},  # parsebook.go:100-101
)

BOOK_TASK = TaskConfig(
    name="douban_book_list",
    seeds=(("https://book.douban.com", 1, "数据tag"),),  # parsebook.go:15-25
    max_depth=5,  # config.toml:5 MaxDepth
    reload=True,  # config.toml:5 Reload = true
    wait_time=2,  # config.toml:5 WaitTime = 2
    # MultiLimiter waits on EVERY tier (limiter.go:22-27,41-44), so the
    # slowest rate binds: 20/60 s (0.33 req/s) < 1/2 s (0.5 req/s)
    budget_count=20,
    budget_window_s=60,
    rules=(RULE_TAG, RULE_BOOK_LIST, RULE_BOOK_DETAIL),
)

# --- doubangroup task (parseurl.go:11-34) ---

RULE_GROUP_URL = RuleSpec(
    name="解析网站URL",
    link_regex=URL_LIST_RE,
    next_rule="解析阳台房",
    emit_reload=True,  # parseurl.go:50
)

RULE_SUN_ROOM = RuleSpec(name="解析阳台房", match_regex=CONTENT_RE)

# NB the reference's Root loop is buggy (parseurl.go:18-19:
# `"...start=%d" + string(rune(0))`, loop body runs once); we seed the
# *intended* first page and document the divergence.
GROUP_TASK = TaskConfig(
    name="find_douban_sun_room",
    seeds=(("https://www.douban.com/group/szsh/discussion?start=0", 1, "解析网站URL"),),
    max_depth=5,
    rules=(RULE_GROUP_URL, RULE_SUN_ROOM),
)

REFERENCE_TASKS: dict[str, TaskConfig] = {
    BOOK_TASK.name: BOOK_TASK,
    GROUP_TASK.name: GROUP_TASK,
}
