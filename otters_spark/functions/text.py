"""Text primitives for the LLM-data-pipeline operators — all native
Catalyst expressions (no Python UDFs in any hot path).

Hashing convention: 60-bit deterministic integers derived from md5
(``conv(substr(md5(x),1,15),16,10)``) — chosen over Spark's builtin
``hash``/``xxhash64`` because md5 is bit-identical in DuckDB
(``('0x'||substr(md5(x),1,15))::BIGINT``), which makes MinHash /
SimHash signatures oracle-checkable cross-engine. 15 hex digits = 60
bits, always positive in an int64.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "tokens_expr",
    "distinct_tokens_expr",
    "word_ngrams_expr",
    "adjacent_pairs_expr",
    "md5_long_expr",
    "minhash_signature_expr",
    "simhash_expr",
    "fingerprint_expr",
    "char_shingles_expr",
    "jaccard_expr",
    "est_jaccard_from_sigs_expr",
    "canonical_url_expr",
]


#: query-parameter names stripped by canonical_url_expr: per-click
#: tracking identifiers that make every shared link a distinct URL
TRACKING_PARAMS = ("gclid", "fbclid", "ref", "mc_cid", "mc_eid")


def canonical_url_expr(url) -> "Column":
    """Canonical form of an absolute http(s) URL — the C4-style URL
    normalization behind URL-level dedup: the same page reached via
    ``https://WWW.Site.com/a/b/?utm_source=x&b=2&a=1#frag`` and
    ``https://site.com/a/b?a=1&b=2`` must collide.

    Rules (each a deliberate, documented choice):
    - host lowercased (DNS is case-insensitive), leading ``www.``
      stripped; scheme dropped (http/https serve the same document);
    - fragment dropped (client-side only);
    - trailing slashes stripped from the path (path CASE is kept —
      unlike hosts, paths are case-sensitive);
    - tracking parameters removed: names starting ``utm_`` plus
      :data:`TRACKING_PARAMS`;
    - surviving query parameters SORTED (order never changes the
      resource) and re-joined; a then-empty query disappears.

    Pure codegen (parse_url + array ops) — runs at scan speed as a
    projection; pair with ``dedup.exact_dedup_keep_first`` on the
    result for URL-level dedup. Expects absolute ``scheme://host...``
    URLs; NULL input yields NULL."""
    u = _c(url)
    host = F.regexp_replace(F.lower(F.parse_url(u, F.lit("HOST"))), r"^www\.", "")
    path = F.regexp_replace(F.parse_url(u, F.lit("PATH")), r"/+$", "")
    query = F.parse_url(u, F.lit("QUERY"))
    name = lambda p: F.split(p, "=")[0]  # noqa: E731
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~name(p).startswith("utm_")
        & ~name(p).isin(*TRACKING_PARAMS),
    )
    qs = F.array_join(F.array_sort(keep), "&")
    return F.when(
        query.isNull() | (qs == ""), F.concat(host, path)
    ).otherwise(F.concat(host, path, F.lit("?"), qs))


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def tokens_expr(text, delimiter: str = " ") -> Column:
    """Whitespace tokenization (simple split keeps DuckDB parity;
    use a regex split for messier corpora)."""
    return F.split(_c(text), delimiter)


def distinct_tokens_expr(text, delimiter: str = " ") -> Column:
    return F.array_distinct(tokens_expr(text, delimiter))


def word_ngrams_expr(tokens, n: int) -> Column:
    """Word n-gram strings over a token-array column. Pass a REAL
    column (materialize the split first): referencing an inline
    tokenizer here re-evaluates it per element, and exploding this
    expression via an intermediate projection triggers the
    Generate-filter trap (see operators/dedup.py:tfidf_cosine_pairs).
    Shorter-than-n docs yield an empty array (``sequence(1, 0)``
    counts DOWN, so the guard is explicit)."""
    t = _c(tokens)
    size = F.size(t)

    def gram(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)])

    grams = F.transform(F.sequence(F.lit(1), size - (n - 1)), gram)
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))


def adjacent_pairs_expr(tokens, left_name: str = "l", right_name: str = "r") -> Column:
    """Adjacent (tokens[i], tokens[i+1]) pairs as an array of two-field
    structs; fewer than two tokens yields a typed empty array (the
    ``sequence()`` counts-down guard). Shared by the bigram LM and the
    BPE pair counter — pass a REAL array column (see
    ``word_ngrams_expr`` for the re-evaluation trap)."""
    t = _c(tokens)
    n = F.size(t)
    pairs = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.struct(a.alias(left_name), b.alias(right_name)),
    )
    empty = F.array().cast(
        f"array<struct<{left_name}:string,{right_name}:string>>"
    )
    return F.when(n >= 2, pairs).otherwise(empty)


def md5_long_expr(x) -> Column:
    """Deterministic 60-bit hash of a string column (see module doc)."""
    return F.conv(F.substring(F.md5(_c(x).cast("string")), 1, 15), 16, 10).cast("long")


def md5_long64_expr(x) -> Column:
    """Deterministic FULL-64-bit hash: the 60-bit draw plus a 16th md5
    nibble in bits 60-63. Composed from two conv() draws because one
    16-hex-char conv would exceed the signed-long cast range; the
    shiftleft wraps into the sign bit by design (bit patterns, not
    arithmetic — the DuckDB twin builds the same pattern in unsigned
    HUGEINT space: lo + hi * 2^60)."""
    h = F.md5(_c(x).cast("string"))
    lo = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    hi = F.conv(F.substring(h, 16, 1), 16, 10).cast("long")
    return lo.bitwiseOR(F.shiftleft(hi, 60))


#: fixed 60-bit permutation constants for the MinHash family
#: (numpy default_rng(99); regenerating changes every signature)
MINHASH_PERM_CONSTANTS: list[int] = [
    583413646677552681, 651506294357710610,
    590198918480418528, 1120854574921554786,
    708935055626519835, 655186265435856591,
    330642580031546584, 639308179001447190,
    539017926517244182, 703348996503225347,
    1072727164374993511, 283486546467559973,
    356758114971935914, 450884139696886028,
    311602092370511532, 403539762130127012,
    1079399344108724090, 435670838689666139,
    893109731352095947, 46770843827787702,
    344326458966482218, 810032441928370608,
    521411772095334499, 1025936298004440196,
    501636183047630434, 718915497780898744,
    674896862365089173, 690751872048649193,
    755954092076409089, 589467991279670386,
    223297553012967209, 79513978067660870,
]


def _perm_mix(h: Column, c: int) -> Column:
    """Cheap per-permutation mixing: x = h XOR c; x XOR (x >> 29).

    Multiplication-free on purpose — int64 overflow wraps in Spark but
    *errors* in DuckDB, so a multiply-based family could never be
    oracle-checked. Diffusion is weaker than a multiply hash; a
    production Spark-only deployment can substitute
    ``xxhash64(token, lit(i))`` per permutation."""
    x = h.bitwiseXOR(F.lit(c))
    return x.bitwiseXOR(F.shiftright(x, 29))


def token_hashes_expr(tokens) -> Column:
    """Per-token 60-bit hashes (one md5 pass). Materialize this as a
    column before fanning out into signature/fingerprint expressions —
    Spark does not reliably CSE higher-order subexpressions, so feeding
    the same md5-transform into 16 permutations would recompute it 16×."""
    return F.transform(_c(tokens), lambda t: md5_long_expr(t))


def minhash_signature_expr(token_hashes, n_hashes: int = 16) -> Column:
    """MinHash signature over a precomputed token-hash array (see
    :func:`token_hashes_expr`): each permutation is a cheap bit-mix +
    array_min — JVM-side, no shuffle, no UDF, no md5 in the per-perm
    loop. Empty token sets yield nulls in the signature."""
    if n_hashes > len(MINHASH_PERM_CONSTANTS):
        raise ValueError(f"n_hashes max {len(MINHASH_PERM_CONSTANTS)}")
    th = _c(token_hashes)

    # NB: plain one-arg lambdas only — a default-arg lambda looks like
    # the 2-arg (element, index) HOF form to pyspark and silently binds
    # the index as the "constant"
    def mixer(c: int):
        return lambda h: _perm_mix(h, c)

    sig = [
        F.array_min(F.transform(th, mixer(MINHASH_PERM_CONSTANTS[i])))
        for i in range(n_hashes)
    ]
    return F.array(*sig)


def simhash_expr(token_hashes, bits: int = 32) -> Column:
    """SimHash over a precomputed token-hash array (see
    :func:`token_hashes_expr`), no explode: bit set in the output iff
    more than half the hashes have it set (equivalent to +1/-1
    voting). ONE aggregate pass with SWAR bit-slicing: the accumulator
    is ⌈bits/4⌉ longs, each packing four 16-bit per-bit counters, so a
    token costs a handful of shift/mask adds instead of ``bits``
    filtered-array materializations (the naive form allocates 32
    arrays per doc and bloats codegen 32×). 16-bit lanes cap the token
    count at 65535 per doc — far above any tokenizer output here; the
    finish lambda unpacks lanes and assembles the fingerprint without
    re-walking the array."""
    th = _c(token_hashes)
    n = F.size(th)
    nlongs = (bits + 3) // 4

    def spread(h, j: int):
        # four bits' worth of this hash, spread into 16-bit lanes
        out = None
        for k in range(4):
            b = 4 * j + k
            if b >= bits:
                break
            term = F.shiftleft(F.shiftright(h, b).bitwiseAND(F.lit(1)), 16 * k)
            out = term if out is None else out + term
        return out

    init = F.struct(*[F.lit(0).cast("long").alias(f"c{j}") for j in range(nlongs)])

    def merge(acc, h):
        return F.struct(*[(acc[f"c{j}"] + spread(h, j)).alias(f"c{j}") for j in range(nlongs)])

    def finish(acc):
        out = F.lit(0).cast("long")
        for b in range(bits):
            j, k = divmod(b, 4)
            cnt = F.shiftright(acc[f"c{j}"], 16 * k).bitwiseAND(F.lit(0xFFFF))
            out = out + F.when(cnt * 2 > n, F.lit(1 << b)).otherwise(F.lit(0))
        return out

    return F.aggregate(th, init, merge, finish)


def fingerprint_expr(text, delimiter: str = " ") -> Column:
    """Broder-style document fingerprint: md5 of the sorted distinct
    token set — robust to token order/duplication."""
    return F.md5(
        F.array_join(F.array_sort(distinct_tokens_expr(text, delimiter)), " ")
    )


def char_shingles_expr(text, n: int = 3) -> Column:
    """Distinct character n-gram shingles of a string.

    Implementation notes: ``substr`` has an O(1) ASCII fast path in
    UTF8String, so the direct form below beats char-array slicing
    (measured: slice+concat_ws was 2-3x slower). Strings shorter than n
    yield an empty array — guarded explicitly because Spark's
    ``sequence(1, 0)`` counts DOWN ([1, 0]), it does not return
    empty."""
    t = _c(text)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        )
    )
    return F.when(F.length(t) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )


def jaccard_expr(a, b) -> Column:
    """Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(_c(a), _c(b)))
    return inter.cast("double") / (F.size(_c(a)) + F.size(_c(b)) - inter)


def est_jaccard_from_sigs_expr(sig_a, sig_b) -> Column:
    """MinHash Jaccard estimate: fraction of equal signature slots."""
    eq = F.size(
        F.filter(F.zip_with(_c(sig_a), _c(sig_b), lambda x, y: x == y), lambda v: v)
    )
    return eq.cast("double") / F.size(_c(sig_a))
