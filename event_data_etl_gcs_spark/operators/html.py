"""HTML/boilerplate text extraction (VERDICT r9 directive #1).

The one standard LLM-pipeline stage the engine lacked: turn raw HTML
into main-content text, dropping markup AND boilerplate (navigation,
headers/footers, ad blocks, link farms). The method is the
trafilatura/jusText family's core, re-expressed as NATIVE Catalyst
expressions — no per-row Python anywhere:

1. **Strip non-content spans**: ``<script>``/``<style>`` elements and
   HTML comments removed with non-greedy regexes.
2. **Block segmentation**: split on block-level tag boundaries
   (``p div li h1-6 nav footer ...``); inline markup (``a b i span``)
   stays inside its block.
3. **Per-block features**: tag-stripped, whitespace-collapsed text;
   spaceless text length; anchor-text length (the jusText link-density
   signal).
4. **Keep rule**: a block survives iff its spaceless text length is
   >= ``MIN_BLOCK_CHARS`` AND anchor text makes up less than 1/3 of it
   (``3*link_len < text_len`` — integer comparison, no float
   threshold). Navigation/ads/footers are link-dense or short; body
   paragraphs are neither.
5. **Reassembly**: kept blocks joined in document order.

Every step is integer/string arithmetic with an exact DuckDB
counterpart (the ``duck_*`` builders), so extraction carries the
repo's exact-oracle discipline. At 100 TB the operator is map-only:
one regex pipeline per row, no shuffle, filters/projections on other
columns still push down, and the whole stage lives in one
WholeStageCodegen span (plan-pinned in tests/test_html_extract.py).

The raw-HTML input is a deterministic FIXTURE derived in-query from
the ``documents`` table (``html_fixture_sql``/``duck_html_fixture``):
each document's text is wrapped into a page with title, nav, header,
per-doc-variant ad/comment/aside blocks, and a footer — identical
strings in both engines, so the extraction oracle is end-to-end exact.

Reference: spark-jobs/sparkify_etl.py has no HTML surface; this is
extension surface mandated by the build brief (LLM-pipeline text
stack).
"""

from __future__ import annotations

# Regexes shared by both engines (Java regex and RE2 agree on this
# subset: inline flags, non-greedy quantifiers, \b, alternation).
# Whitespace is spelled as an EXPLICIT class, never \s: Java's \s
# includes vertical tab (\x0B) while RE2's does not (ADVICE r10 #4) —
# the explicit class is identical in both engines.
_WS_CLASS = r"[ \t\n\x0B\f\r]"
_STRIP_RE = r"(?is)<script\b[^>]*>.*?</script>|<style\b[^>]*>.*?</style>|<!--.*?-->"
_BLOCK_RE = (
    r"(?i)</?(?:p|div|ul|ol|li|h[1-6]|br|hr|nav|header|footer|aside|"
    r"article|section|main|table|thead|tbody|tr|td|th|blockquote|pre|"
    r"title|head|body|html|form|figure|figcaption)(?:" + _WS_CLASS + r"[^>]*)?/?>"
)
_TAG_RE = r"<[^>]*>"
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
_WS_RE = _WS_CLASS + r"+"

# Keep thresholds: spaceless chars per block, and the integer form of
# link-density < 1/3 (3*link_len < text_len).
MIN_BLOCK_CHARS = 25
LINK_DENSITY_NUM = 3


def _sq(pat: str) -> str:
    """Escape a regex for a Spark SQL single-quoted literal (backslashes
    doubled, quotes backslash-escaped; Spark string literals process
    escapes)."""
    return pat.replace("\\", "\\\\").replace("'", "\\'")


def _dq(pat: str) -> str:
    """Escape a regex for a DuckDB single-quoted literal (quotes doubled;
    DuckDB literals do NOT process backslash escapes)."""
    return pat.replace("'", "''")


# =========================================================================
# Spark-SQL expression builders (strings for F.expr)
# =========================================================================

def strip_nondisplay_sql(col: str) -> str:
    """Remove script/style elements and comments."""
    return f"regexp_replace({col}, '{_sq(_STRIP_RE)}', ' ')"


def blocks_sql(col: str) -> str:
    """Split (already script-stripped) HTML into block-level segments."""
    return f"split({strip_nondisplay_sql(col)}, '{_sq(_BLOCK_RE)}')"


# -------------------------------------------------------------------------
# HTML entity decoding (VERDICT r10 directive #2): extracted text must not
# carry raw entities (&amp;, &#39;, ...) into downstream token/quality/
# langid features. Decoded dual-dialect, in ONE logical pass approximated
# by a chain whose ampersand-producing steps run LAST (so '&amp;lt;'
# decodes to the literal text '&lt;', never to '<'):
#   1. decimal numeric entities &#NN; for printable ASCII 32..126,
#      EXCLUDING 38 ('&' — deferred to step 3). Codes outside the range
#      (multi-byte codepoints: Spark's chr() wraps mod 256 where DuckDB's
#      is a real codepoint) are kept as literal text, documented.
#   2. the named set &lt; &gt; &quot; &apos; &nbsp;
#   2b. the TYPOGRAPHIC set real pages are full of (round 12, VERDICT
#      r11 #2): en/em dash, curly quotes, ellipsis, middot, copy, trade
#      — named AND canonical decimal AND hex (&#xNN;) spellings, decoded
#      by chained replace() with literal UTF-8 replacement strings (no
#      chr()/char(), so no Spark-wraps-mod-256 vs DuckDB-real-codepoint
#      divergence). Hex forms with uppercase hex digits are covered for
#      the codes that contain letters; other numeric entities outside
#      the curated set stay literal in BOTH engines, documented.
#   3. &amp; and &#38; (the only decodes that can CREATE an ampersand).
# -------------------------------------------------------------------------

_NUMENT_SPLIT_RE = r"&#[0-9]+;"
_NUMENT_CAP_RE = r"&#([0-9]+);"

# (name, decimal digits, lowercase hex digits, replacement char)
_TYPO_CHARS = (
    ("ndash", "8211", "2013", "–"),
    ("mdash", "8212", "2014", "—"),
    ("lsquo", "8216", "2018", "‘"),
    ("rsquo", "8217", "2019", "’"),
    ("ldquo", "8220", "201c", "“"),
    ("rdquo", "8221", "201d", "”"),
    ("hellip", "8230", "2026", "…"),
    ("middot", "183", "b7", "·"),
    ("copy", "169", "a9", "©"),
    ("trade", "8482", "2122", "™"),
)


def _typo_entity_forms() -> list[tuple[str, str]]:
    """Every decoded spelling of the typographic set: &name;, &#NNNN;,
    &#xhhhh; (plus the uppercase-hex-digit variant where the code
    contains letters). Plain substring replaces — entity spellings end
    in ';' so no form is a prefix of a longer undecoded entity."""
    forms: list[tuple[str, str]] = []
    for name, dec, hx, ch in _TYPO_CHARS:
        forms.append((f"&{name};", ch))
        forms.append((f"&#{dec};", ch))
        forms.append((f"&#x{hx};", ch))
        if hx != hx.upper():
            forms.append((f"&#x{hx.upper()};", ch))
    return forms


_TYPO_ENTITY_FORMS = _typo_entity_forms()


def _decode_entities_sql(s: str) -> str:
    """Spark: decode HTML entities in one string expression. ``s`` is
    bound ONCE via a 1-element transform (the tl-binding trick the keep
    predicate uses), so the tag-strip feeding it is not recomputed.
    The whole chain sits behind an ``instr(s0, '&') = 0`` fast path
    (round 12): every entity spelling contains '&', so ampersand-free
    text — the overwhelming block majority in real pages — skips the
    numeric machinery and the full replace chain."""
    out = (
        "element_at(transform(array(named_struct("
        f"'p', split(s0, '{_NUMENT_SPLIT_RE}', -1), "
        f"'c', regexp_extract_all(s0, '{_NUMENT_CAP_RE}', 1))), z -> "
        "CASE WHEN size(z.c) = 0 THEN s0 ELSE concat(element_at(z.p, 1), "
        "aggregate(sequence(1, size(z.c)), '', (acc, i) -> concat(acc, "
        "CASE WHEN coalesce(try_cast(element_at(z.c, i) AS INT), -1) "
        "BETWEEN 32 AND 126 AND try_cast(element_at(z.c, i) AS INT) != 38 "
        "THEN char(try_cast(element_at(z.c, i) AS INT)) "
        "ELSE concat('&#', element_at(z.c, i), ';') END, "
        "element_at(z.p, i + 1)))) END), 1)"
    )
    for ent, rep in (
        ("&lt;", "'<'"),
        ("&gt;", "'>'"),
        ("&quot;", "'\"'"),
        ("&apos;", "char(39)"),
        ("&nbsp;", "' '"),
    ):
        out = f"replace({out}, '{ent}', {rep})"
    # typographic set (round 12) — still BEFORE the ampersand-producing
    # decodes, so '&amp;mdash;' yields the literal text '&mdash;'
    for ent, ch in _TYPO_ENTITY_FORMS:
        out = f"replace({out}, '{ent}', '{ch}')"
    out = f"replace(replace({out}, '&amp;', '&'), '&#38;', '&')"
    return (
        f"element_at(transform(array({s}), s0 -> "
        f"CASE WHEN instr(s0, '&') = 0 THEN s0 ELSE {out} END), 1)"
    )


def _clean_sql(b: str) -> str:
    """Tag-strip + entity-decode + whitespace-collapse + trim one block
    expression. Decoding runs AFTER the tag strip (entity-encoded markup
    is text, not markup) and BEFORE the whitespace collapse (&nbsp;
    becomes a regular space and folds)."""
    decoded = _decode_entities_sql(f"regexp_replace({b}, '{_sq(_TAG_RE)}', ' ')")
    return f"trim(regexp_replace({decoded}, '{_sq(_WS_RE)}', ' '))"


def _linklen_sql(b: str) -> str:
    """Total spaceless anchor-text length inside one block."""
    return (
        f"length(regexp_replace(array_join("
        f"regexp_extract_all({b}, '{_sq(_ANCHOR_RE)}', 1), ''), "
        f"'{_sq(_TAG_RE)}|{_sq(_WS_RE)}', ''))"
    )


def _keep_pred_sql(b: str) -> str:
    """Block-survival predicate (length + link-density gates)."""
    return (
        f"element_at(transform(array(length(replace({_clean_sql(b)}, ' ', ''))), "
        f"tl -> tl >= {MIN_BLOCK_CHARS} "
        f"AND {LINK_DENSITY_NUM} * {_linklen_sql(b)} < tl), 1)"
    )


def kept_blocks_sql(blocks_col: str) -> str:
    return f"filter({blocks_col}, b -> {_keep_pred_sql('b')})"


def block_features_sql(blocks_col: str) -> str:
    """Per-block struct array ``(c, k)``: the cleaned text and the keep
    flag, with the clean chain (tag strip + entity decode + whitespace
    collapse) evaluated ONCE per block.

    Round-12 fusion: ``extract_frame``'s three outputs (n_blocks,
    n_blocks_kept, text_clean) each re-derived the cleaned text from the
    raw block — the keep predicate appeared in two of them and the clean
    chain in all three plus the final transform, so every block paid the
    regex+replace pipeline 3-4x. Staging this array as a real column
    lets all consumers read ``f.c``/``f.k`` instead (Catalyst keeps the
    column staged: CollapseProject declines to inline non-cheap
    expressions referenced more than once). The keep math is unchanged
    from :func:`_keep_pred_sql` — same spaceless-length let binding,
    same short-circuited link-density term — so results are identical.
    """
    keep = (
        f"element_at(transform(array(length(replace(c, ' ', ''))), "
        f"tl -> tl >= {MIN_BLOCK_CHARS} "
        f"AND {LINK_DENSITY_NUM} * {_linklen_sql('b')} < tl), 1)"
    )
    return (
        f"transform({blocks_col}, b -> "
        f"element_at(transform(array({_clean_sql('b')}), c -> "
        f"named_struct('c', c, 'k', {keep})), 1))"
    )


def extracted_text_sql(blocks_col: str) -> str:
    """Main-content text: kept blocks, cleaned, joined in order."""
    return (
        f"array_join(transform({kept_blocks_sql(blocks_col)}, "
        f"b -> {_clean_sql('b')}), ' ')"
    )


def n_blocks_sql(blocks_col: str) -> str:
    """Count of non-empty text blocks (empty split artifacts excluded —
    engine split functions differ on empty-string bookkeeping, cleaned
    non-empty counts do not)."""
    return (
        f"size(filter({blocks_col}, b -> length({_clean_sql('b')}) > 0))"
    )


def n_kept_sql(blocks_col: str) -> str:
    return f"size({kept_blocks_sql(blocks_col)})"


def html_fixture_sql(doc_id: str, text: str, source: str) -> str:
    """Deterministic raw-HTML page for a document row (Spark dialect).
    Layout varies by doc_id % 3 (ad block / stray comment + an unclosed
    tag / link-dense aside) so the keep rule is exercised on every
    shape. Paragraph breaks are injected at the literal token 'merge '
    (plain substring replace — identical left-to-right non-overlap
    semantics in both engines). Round 11 adversarial variants (VERDICT
    r10 directive #2): the nav mixes the three href quote styles, the
    external footer link is UNQUOTED on even doc_ids, the aside uses a
    single-quoted href, and every page carries an entity-laden content
    paragraph (named + decimal + out-of-range entities)."""
    did = f"CAST({doc_id} AS STRING)"
    return (
        f"'<html><head><title>Doc ' || {did} || '</title>'"
        " || '<style>body { margin: 0; }</style>'"
        f" || '<script>var t = \"' || {source} || '\"; track(t);</script>'"
        " || '</head><body>'"
        " || '<nav><ul><li><a href=\"/\">Home</a></li>"
        "<li><a href=\\'/archive\\'>Archive section</a></li>"
        "<li><a href=/about>About this site</a></li></ul></nav>'"
        f" || '<header><h1>' || {source} || ' feed</h1></header>'"
        f" || CASE WHEN {doc_id} % 3 = 0 THEN "
        "'<div class=\"ad\"><a href=\"/buy\">Buy the thing now</a> "
        "<a href=\"/offer\">Limited time offer</a></div>' ELSE '' END"
        f" || CASE WHEN {doc_id} % 3 = 1 THEN "
        "'<!-- rendered by engine v2 <div>ghost block</div> -->"
        "<div>trailing unclosed <b>emphasis that never closes in this block' "
        "ELSE '' END"
        f" || '<article><p>' || replace({text}, 'merge ', 'merge</p><p>') || '</p></article>'"
        " || '<p>Q&amp;A entities &#101;ncoded here: &lt;angle&gt; "
        "&quot;quoted&quot; text&nbsp;joined &ndash; typographic &#8212; dash "
        "&#x2019;curly&#x201C; quoted&#x201D; forms &hellip; &#8230; &middot; "
        "&copy; &#169; &trade; decoded while &amp;mdash; and &#9731; "
        "stay literal</p>'"
        f" || CASE WHEN {doc_id} % 3 = 2 THEN "
        "'<aside><p>Read more: <a href=\"/rel1\">related story one</a> "
        "<a href=\\'/rel2\\'>related story two</a> "
        "<a href=//cdn.example.net/mirror>cached mirror</a></p></aside>' "
        "ELSE '' END"
        f" || '<footer><p>Copyright 2024 ' || {source} || "
        "' - <a href=\"/terms\">Terms of use</a> "
        "<a href=\"/privacy\">Privacy</a> "
        # round 12: four alias spellings of TWO canonical URLs (default
        # ports, uppercase scheme, duplicate path slashes, lowercase
        # percent-hex, empty query) — the frontier must dedup them
        "<a href=\"https://alias.example.net:443//x//%2fy?id=7#frag\">alias one</a> "
        "<a href=\"HTTPS://alias.example.net/x/%2Fy?id=7&utm_campaign=z\">alias two</a> "
        "<a href=\"http://alias.example.net:80/plain\">alias three</a> "
        "<a href=\"http://alias.example.net/plain?\">alias four</a> '"
        f" || CASE WHEN {doc_id} % 2 = 0 THEN "
        f"'<a href=https://d' || CAST({doc_id} % 17 AS STRING) || "
        f"'.example.com/ref/' || {did} || '?gclid=x&id=' || {did} || "
        "'>related source</a>' ELSE "
        f"'<a href=\"https://d' || CAST({doc_id} % 17 AS STRING) || "
        f"'.example.com/ref/' || {did} || '?utm_source=' || {source} || "
        "'&ref=a#sec\">related source</a>' END"
        " || '</p></footer>'"
        " || '</body></html>'"
    )


# =========================================================================
# DuckDB oracle builders (same math, DuckDB syntax: literal backslashes,
# explicit 'g' flag on replace-all, list_* lambda spellings)
# =========================================================================

def duck_strip_nondisplay(col: str) -> str:
    return f"regexp_replace({col}, '{_STRIP_RE}', ' ', 'g')"


def duck_blocks(col: str) -> str:
    return f"string_split_regex({duck_strip_nondisplay(col)}, '{_BLOCK_RE}')"


def _duck_decode_entities(s: str) -> str:
    """DuckDB mirror of :func:`_decode_entities_sql` — same chain, list
    lambdas + struct binding, chr() agreeing with Spark's char() on the
    decoded 32..126 range, same instr-gated ampersand fast path."""
    out = (
        "list_transform([{"
        f"'p': string_split_regex(s0, '{_NUMENT_SPLIT_RE}'), "
        f"'c': regexp_extract_all(s0, '{_NUMENT_CAP_RE}', 1)"
        "}], z -> "
        "CASE WHEN len(z.c) = 0 THEN s0 ELSE z.p[1] || "
        "coalesce(array_to_string(list_transform(generate_series(1, len(z.c)), "
        "i -> CASE WHEN coalesce(try_cast(z.c[i] AS INT), -1) "
        "BETWEEN 32 AND 126 AND try_cast(z.c[i] AS INT) != 38 "
        "THEN chr(try_cast(z.c[i] AS INT)) "
        "ELSE '&#' || z.c[i] || ';' END || z.p[i + 1]), ''), '') "
        "END)[1]"
    )
    for ent, rep in (
        ("&lt;", "'<'"),
        ("&gt;", "'>'"),
        ("&quot;", "'\"'"),
        ("&apos;", "chr(39)"),
        ("&nbsp;", "' '"),
    ):
        out = f"replace({out}, '{ent}', {rep})"
    for ent, ch in _TYPO_ENTITY_FORMS:
        out = f"replace({out}, '{ent}', '{ch}')"
    out = f"replace(replace({out}, '&amp;', '&'), '&#38;', '&')"
    return (
        f"list_transform([{s}], s0 -> "
        f"CASE WHEN instr(s0, '&') = 0 THEN s0 ELSE {out} END)[1]"
    )


def _duck_clean(b: str) -> str:
    decoded = _duck_decode_entities(
        f"regexp_replace({b}, '{_TAG_RE}', ' ', 'g')"
    )
    return f"trim(regexp_replace({decoded}, '{_WS_RE}', ' ', 'g'))"


def _duck_linklen(b: str) -> str:
    # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — a no-anchor block must score link_len 0
    return (
        f"length(regexp_replace(coalesce(array_to_string("
        f"regexp_extract_all({b}, '{_ANCHOR_RE}', 1), ''), ''), "
        f"'{_TAG_RE}|{_WS_RE}', '', 'g'))"
    )


def _duck_keep_pred(b: str) -> str:
    return (
        f"(list_transform([length(replace({_duck_clean(b)}, ' ', ''))], "
        f"tl -> tl >= {MIN_BLOCK_CHARS} "
        f"AND {LINK_DENSITY_NUM} * {_duck_linklen(b)} < tl)[1])"
    )


def duck_kept_blocks(blocks_col: str) -> str:
    return f"list_filter({blocks_col}, b -> {_duck_keep_pred('b')})"


def duck_extracted_text(blocks_col: str) -> str:
    # coalesce mirrors Spark's array_join([]) == '' (see _duck_linklen)
    return (
        f"coalesce(array_to_string(list_transform({duck_kept_blocks(blocks_col)}, "
        f"b -> {_duck_clean('b')}), ' '), '')"
    )


def duck_n_blocks(blocks_col: str) -> str:
    return (
        f"len(list_filter({blocks_col}, b -> length({_duck_clean('b')}) > 0))"
    )


def duck_n_kept(blocks_col: str) -> str:
    return f"len({duck_kept_blocks(blocks_col)})"


def duck_html_fixture(doc_id: str, text: str, source: str) -> str:
    did = f"CAST({doc_id} AS VARCHAR)"
    return (
        f"'<html><head><title>Doc ' || {did} || '</title>'"
        " || '<style>body { margin: 0; }</style>'"
        f" || '<script>var t = \"' || {source} || '\"; track(t);</script>'"
        " || '</head><body>'"
        " || '<nav><ul><li><a href=\"/\">Home</a></li>"
        "<li><a href=''/archive''>Archive section</a></li>"
        "<li><a href=/about>About this site</a></li></ul></nav>'"
        f" || '<header><h1>' || {source} || ' feed</h1></header>'"
        f" || CASE WHEN {doc_id} % 3 = 0 THEN "
        "'<div class=\"ad\"><a href=\"/buy\">Buy the thing now</a> "
        "<a href=\"/offer\">Limited time offer</a></div>' ELSE '' END"
        f" || CASE WHEN {doc_id} % 3 = 1 THEN "
        "'<!-- rendered by engine v2 <div>ghost block</div> -->"
        "<div>trailing unclosed <b>emphasis that never closes in this block' "
        "ELSE '' END"
        f" || '<article><p>' || replace({text}, 'merge ', 'merge</p><p>') || '</p></article>'"
        " || '<p>Q&amp;A entities &#101;ncoded here: &lt;angle&gt; "
        "&quot;quoted&quot; text&nbsp;joined &ndash; typographic &#8212; dash "
        "&#x2019;curly&#x201C; quoted&#x201D; forms &hellip; &#8230; &middot; "
        "&copy; &#169; &trade; decoded while &amp;mdash; and &#9731; "
        "stay literal</p>'"
        f" || CASE WHEN {doc_id} % 3 = 2 THEN "
        "'<aside><p>Read more: <a href=\"/rel1\">related story one</a> "
        "<a href=''/rel2''>related story two</a> "
        "<a href=//cdn.example.net/mirror>cached mirror</a></p></aside>' "
        "ELSE '' END"
        f" || '<footer><p>Copyright 2024 ' || {source} || "
        "' - <a href=\"/terms\">Terms of use</a> "
        "<a href=\"/privacy\">Privacy</a> "
        # round 12: four alias spellings of TWO canonical URLs (default
        # ports, uppercase scheme, duplicate path slashes, lowercase
        # percent-hex, empty query) — the frontier must dedup them
        "<a href=\"https://alias.example.net:443//x//%2fy?id=7#frag\">alias one</a> "
        "<a href=\"HTTPS://alias.example.net/x/%2Fy?id=7&utm_campaign=z\">alias two</a> "
        "<a href=\"http://alias.example.net:80/plain\">alias three</a> "
        "<a href=\"http://alias.example.net/plain?\">alias four</a> '"
        f" || CASE WHEN {doc_id} % 2 = 0 THEN "
        f"'<a href=https://d' || CAST({doc_id} % 17 AS VARCHAR) || "
        f"'.example.com/ref/' || {did} || '?gclid=x&id=' || {did} || "
        "'>related source</a>' ELSE "
        f"'<a href=\"https://d' || CAST({doc_id} % 17 AS VARCHAR) || "
        f"'.example.com/ref/' || {did} || '?utm_source=' || {source} || "
        "'&ref=a#sec\">related source</a>' END"
        " || '</p></footer>'"
        " || '</body></html>'"
    )


# =========================================================================
# Link extraction (round 10, second half): the crawl-frontier / web-graph
# companion of text extraction — harvest every anchor's href + text from
# the RAW page (boilerplate links are exactly the ones a link graph
# wants). Same dual-dialect regex discipline as the text path; map-only.
# =========================================================================

# Real-world crawls quote href values three ways (VERDICT r10 directive
# #2): double-quoted, single-quoted (href='/x'), and unquoted (href=/x).
# Rather than a 3-branch extraction regex (regexp_extract_all reads ONE
# capture group), both dialects NORMALIZE single-quoted and unquoted
# href values into double-quoted form first — two replace-all passes,
# map-only — and extract with the one double-quoted pattern. \b before
# href would match inside data-href (word boundary after '-'), so the
# patterns require actual whitespace before the attribute name.
_HREF_SQ_RE = (
    r"(?is)(<a\b[^>]*?" + _WS_CLASS + r"href" + _WS_CLASS + r"*=" + _WS_CLASS
    + r"*)'([^']*)'"
)
_HREF_UQ_RE = (
    r"(?is)(<a\b[^>]*?" + _WS_CLASS + r"href" + _WS_CLASS + r"*=" + _WS_CLASS
    + r"*)([^'\" \t\n\x0B\f\r>][^ \t\n\x0B\f\r>]*)"
)
_ANCHOR_HREF_RE = (
    r"(?is)<a\b[^>]*?" + _WS_CLASS + r"href" + _WS_CLASS + r"*=" + _WS_CLASS
    + r'*"([^"]*)"[^>]*>(.*?)</a>'
)
# Absolute http(s) OR protocol-relative (//cdn.example.net/x — common
# in real crawls; round 11): both carry a host and are external links.
# (?i) (ADVICE r11): the scheme is case-insensitive here exactly like in
# canonicalization's '(?i)^https?://' — without it an 'HTTPS://x/..'
# href got a canonical_url yet is_external=false, so the same link was
# classified inconsistently between the frontier and the edge list.
_HOST_RE = r"(?i)^(?:https?:)?//([^/]+)"


def normalize_hrefs_sql(col: str) -> str:
    """Rewrite single-quoted then unquoted href values to double-quoted
    form (the unquoted pass skips already-quoted values — its first
    char class excludes both quote characters)."""
    sq = f"regexp_replace({col}, '{_sq(_HREF_SQ_RE)}', '$1\"$2\"')"
    return f"regexp_replace({sq}, '{_sq(_HREF_UQ_RE)}', '$1\"$2\"')"


def duck_normalize_hrefs(col: str) -> str:
    sq = f"regexp_replace({col}, '{_dq(_HREF_SQ_RE)}', '\\1\"\\2\"', 'g')"
    return f"regexp_replace({sq}, '{_dq(_HREF_UQ_RE)}', '\\1\"\\2\"', 'g')"


def hrefs_sql(col: str) -> str:
    """Array of href values, document order (all three quote styles)."""
    return (
        f"regexp_extract_all({normalize_hrefs_sql(col)}, "
        f"'{_sq(_ANCHOR_HREF_RE)}', 1)"
    )


def anchor_texts_sql(col: str) -> str:
    """Array of anchor inner texts (tag-stripped, entity-decoded,
    ws-collapsed), aligned index-for-index with :func:`hrefs_sql`
    (same normalized input, same regex, same matches)."""
    return (
        f"transform(regexp_extract_all({normalize_hrefs_sql(col)}, "
        f"'{_sq(_ANCHOR_HREF_RE)}', 2), a -> {_clean_sql('a')})"
    )


def href_host_sql(href: str) -> str:
    """Host of an absolute http(s) URL; '' for relative links."""
    return f"regexp_extract({href}, '{_sq(_HOST_RE)}', 1)"


def anchors_sql(col: str) -> str:
    """Array of FULL anchor matches (capture group 0) from the
    normalized page — ONE page-scale regex pass (round-12 fusion).

    ``hrefs_sql`` + ``anchor_texts_sql`` each re-ran the two
    normalization replaces AND the anchor extraction over the whole
    page (4 page-scale regex passes per row); extracting the full
    match once and re-deriving href/text per anchor does the page-
    scale work once, then only anchor-sized regexes. Each element is a
    leftmost-first match of the same pattern, so re-matching the
    pattern against the element reproduces the original group spans
    exactly — the derived href/text arrays are identical."""
    return (
        f"regexp_extract_all({normalize_hrefs_sql(col)}, "
        f"'{_sq(_ANCHOR_HREF_RE)}', 0)"
    )


def anchor_href_sql(anchor: str) -> str:
    """href value of one full anchor match (group 1 re-extracted)."""
    return f"regexp_extract({anchor}, '{_sq(_ANCHOR_HREF_RE)}', 1)"


def anchor_text_sql(anchor: str) -> str:
    """Cleaned inner text of one full anchor match (group 2
    re-extracted, then tag-stripped/entity-decoded/ws-collapsed
    exactly like :func:`anchor_texts_sql`)."""
    return _clean_sql(
        f"regexp_extract({anchor}, '{_sq(_ANCHOR_HREF_RE)}', 2)"
    )


def duck_hrefs(col: str) -> str:
    return (
        f"regexp_extract_all({duck_normalize_hrefs(col)}, "
        f"'{_ANCHOR_HREF_RE}', 1)"
    )


def duck_anchor_texts(col: str) -> str:
    return (
        f"list_transform(regexp_extract_all({duck_normalize_hrefs(col)}, "
        f"'{_ANCHOR_HREF_RE}', 2), a -> {_duck_clean('a')})"
    )


def duck_href_host(href: str) -> str:
    return f"regexp_extract({href}, '{_HOST_RE}', 1)"


# =========================================================================
# URL canonicalization (round 11): the normalization a crawl pipeline
# applies BEFORE frontier dedup / graph building — resolve relative
# references against the page host, lowercase the scheme+authority
# (case-insensitive per RFC 3986; paths stay case-sensitive), strip the
# fragment, and drop tracking parameters (utm_*, gclid, fbclid). Pure
# string expressions, map-only, dual-dialect exact. Non-http(s) schemes
# (mailto:, javascript:, ...) canonicalize to NULL — they are not crawl
# frontier entries. No lookaheads anywhere (RE2 has none).
# =========================================================================

_AUTH_RE = r"^[^/]*//[^/?]*"
_TRACKING_RE = r"^(utm_|gclid=|fbclid=)"


def _resolved_url_sql(href: str, src_host: str, dialect: str) -> str:
    """Resolve ``href`` to an absolute URL against ``src_host``.

    CONTRACT (ADVICE r11, documented deliberately): path-relative
    references ('about/page') resolve against the HOST ROOT, not the
    source page's base path, and '.'/'..' segments are NOT normalized —
    the harvest table carries a page HOST but no page PATH, so an
    RFC 3986 §5.2 merge base is unavailable by construction. Both
    dialects implement the identical root-relative rule, so frontier
    dedup and the oracle agree; a caller with real page URLs would
    pre-resolve hrefs before canonicalization."""
    rl = (
        (lambda e, p: f"{e} RLIKE '{p}'")
        if dialect == "spark"
        else (lambda e, p: f"regexp_matches({e}, '{p}')")
    )
    return (
        f"CASE WHEN {href} IS NULL OR {href} = '' THEN NULL "
        f"WHEN {rl(href, '(?i)^https?://')} THEN {href} "
        f"WHEN {rl(href, '^//')} THEN 'https:' || {href} "
        # any other explicit scheme (mailto:, javascript:, tel:, data:)
        f"WHEN {rl(href, '^[A-Za-z][A-Za-z0-9+.-]*:')} THEN NULL "
        f"WHEN {rl(href, '^/')} THEN 'https://' || {src_host} || {href} "
        f"ELSE 'https://' || {src_host} || '/' || {href} END"
    )


# Round-12 frontier-alias closers (VERDICT r11 #3), applied in both
# dialects after the authority lowering:
#   - default ports stripped (http://h:80/ == http://h/, https :443 —
#     RFC 3986 §3.2.3); anchored patterns, scheme already lowercase
#   - duplicate path slashes collapsed (//x//y -> /x/y) in the PATH
#     only (the scheme's // and the query are untouched)
#   - percent-encoding hex uppercased (%2f -> %2F — RFC 3986 §2.1 says
#     uppercase is canonical), via a split-on-'%' pass that fixes the
#     two chars after each '%' iff they are hex digits
_PORT80_RE = r"^(http://[^/:?]*):80([/?]|$)"
_PORT443_RE = r"^(https://[^/:?]*):443([/?]|$)"
_HEX2_RE = r"^[0-9a-fA-F][0-9a-fA-F]$"


def canonical_url_sql(href: str, src_host: str) -> str:
    """Spark expression: canonical absolute URL of ``href`` found on a
    page whose host is ``src_host`` (NULL for empty/non-http hrefs)."""
    resolved = _resolved_url_sql(href, src_host, "spark")
    auth = f"regexp_extract(u1, '{_sq(_AUTH_RE)}', 0)"
    lowered = f"lower({auth}) || substring(u1, length({auth}) + 1)"
    portless = (
        f"regexp_replace(regexp_replace(w0, '{_PORT80_RE}', '$1$2'), "
        f"'{_PORT443_RE}', '$1$2')"
    )
    pct = (
        "CASE WHEN instr(w1, '%') = 0 THEN w1 ELSE "
        "element_at(transform(array(split(w1, '%', -1)), ps -> "
        "concat(element_at(ps, 1), "
        "array_join(transform(slice(ps, 2, size(ps) - 1), p -> "
        f"concat('%', CASE WHEN substring(p, 1, 2) RLIKE '{_HEX2_RE}' "
        "THEN concat(upper(substring(p, 1, 2)), substring(p, 3)) "
        "ELSE p END)), ''))), 1) END"
    )
    pre = "CASE WHEN instr(w, '?') > 0 THEN substring(w, 1, instr(w, '?') - 1) ELSE w END"
    q = "CASE WHEN instr(w, '?') > 0 THEN substring(w, instr(w, '?') + 1) ELSE '' END"
    pauth = f"regexp_extract(z.pre, '{_sq(_AUTH_RE)}', 0)"
    cpre = (
        f"concat({pauth}, "
        f"regexp_replace(substring(z.pre, length({pauth}) + 1), '//+', '/'))"
    )
    final = (
        f"{cpre} || CASE WHEN size(filter(split(z.q, '&'), "
        f"p -> p != '' AND NOT p RLIKE '{_sq(_TRACKING_RE)}')) = 0 THEN '' "
        "ELSE '?' || array_join(filter(split(z.q, '&'), "
        f"p -> p != '' AND NOT p RLIKE '{_sq(_TRACKING_RE)}'), '&') END"
    )
    return (
        f"element_at(transform(array({resolved}), u0 -> "
        "element_at(transform(array(regexp_replace(u0, '#.*', '')), u1 -> "
        f"element_at(transform(array({lowered}), w0 -> "
        f"element_at(transform(array({portless}), w1 -> "
        f"element_at(transform(array({pct}), w -> "
        f"element_at(transform(array(named_struct('pre', {pre}, 'q', {q})), "
        f"z -> {final}), 1)), 1)), 1)), 1)), 1)), 1)"
    )


def duck_canonical_url(href: str, src_host: str) -> str:
    """DuckDB mirror of :func:`canonical_url_sql` — same resolution,
    lowering, fragment strip, default-port strip, path-slash collapse,
    percent-hex uppercasing, and tracking-param filter."""
    resolved = _resolved_url_sql(href, src_host, "duck")
    auth = f"regexp_extract(u1, '{_AUTH_RE}', 0)"
    lowered = f"lower({auth}) || substring(u1, length({auth}) + 1)"
    portless = (
        f"regexp_replace(regexp_replace(w0, '{_PORT80_RE}', '\\1\\2'), "
        f"'{_PORT443_RE}', '\\1\\2')"
    )
    pct = (
        "CASE WHEN instr(w1, '%') = 0 THEN w1 ELSE "
        "list_transform([string_split(w1, '%')], ps -> "
        "ps[1] || coalesce(array_to_string(list_transform(ps[2:], p -> "
        f"'%' || CASE WHEN regexp_matches(substring(p, 1, 2), '{_HEX2_RE}') "
        "THEN upper(substring(p, 1, 2)) || substring(p, 3) "
        "ELSE p END), ''), ''))[1] END"
    )
    pre = "CASE WHEN instr(w, '?') > 0 THEN substring(w, 1, instr(w, '?') - 1) ELSE w END"
    q = "CASE WHEN instr(w, '?') > 0 THEN substring(w, instr(w, '?') + 1) ELSE '' END"
    pauth = f"regexp_extract(z.pre, '{_AUTH_RE}', 0)"
    cpre = (
        f"({pauth} || "
        f"regexp_replace(substring(z.pre, length({pauth}) + 1), '//+', '/', 'g'))"
    )
    keep = (
        "list_filter(string_split(z.q, '&'), "
        f"p -> p != '' AND NOT regexp_matches(p, '{_TRACKING_RE}'))"
    )
    final = (
        f"{cpre} || CASE WHEN len({keep}) = 0 THEN '' "
        f"ELSE '?' || array_to_string({keep}, '&') END"
    )
    return (
        f"list_transform([{resolved}], u0 -> "
        "list_transform([regexp_replace(u0, '#.*', '', 'g')], u1 -> "
        f"list_transform([{lowered}], w0 -> "
        f"list_transform([{portless}], w1 -> "
        f"list_transform([{pct}], w -> "
        "list_transform([{'pre': " + pre + ", 'q': " + q + "}], "
        f"z -> {final})[1])[1])[1])[1])[1])[1]"
    )
