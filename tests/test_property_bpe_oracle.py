"""Property test for the BPE oracle's encoding argument (round 7).

The DuckDB twin of ``text_bpe_train`` applies each merge with a
string ``replace`` over a two-space-delimited symbol encoding
(' a  b  c '), claiming that replace's left-to-right non-overlapping
semantics equal the Spark accumulator's greedy merge
(operators/text_analysis.train_bpe_merges). The sf-sweep checks that
end-to-end on real corpora; this test checks the CLAIM itself on
adversarial token sequences — overlapping pair runs, multi-char
symbols sharing prefixes/suffixes, merges whose output is the left
symbol of the next round — where an encoding bug would hide.
Python's str.replace has the same scan-resume-after-replacement
semantics as DuckDB's replace, so the simulation is faithful without
a database in the loop."""

import random

import pytest


def greedy_merge(tokens: list[str], left: str, right: str) -> list[str]:
    """The Spark accumulator: scan left-to-right, merge when the
    accumulator's last symbol is ``left`` and the current is
    ``right`` (a merged symbol never re-merges in the same pass
    unless it equals ``left``)."""
    acc: list[str] = []
    for t in tokens:
        if acc and acc[-1] == left and t == right:
            acc[-1] = left + right
        else:
            acc.append(t)
    return acc


def replace_merge(tokens: list[str], left: str, right: str) -> list[str]:
    """The oracle encoding: two-space delimiter, single-space padding,
    one str.replace."""
    s = " " + "  ".join(tokens) + " "
    s = s.replace(f" {left}  {right} ", f" {left}{right} ")
    return s.strip().split("  ")


def count_pairs(corpora, weights):
    counts: dict[tuple[str, str], int] = {}
    for toks, w in zip(corpora, weights):
        for a, b in zip(toks, toks[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + w
    return counts


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6])
def test_replace_merge_equals_greedy_merge_iterated(seed):
    """Run 6 full BPE rounds (argmax + apply) over random word
    multisets with a run-heavy alphabet; both application semantics
    must produce identical merge tables AND identical tokenizations
    at every round."""
    rng = random.Random(seed)
    alphabet = ["a", "b", "c"]
    words = []
    for _ in range(30):
        # run-heavy: long 'aaaa' stretches maximize overlap hazards
        w = "".join(
            rng.choice(alphabet if rng.random() < 0.4 else ["a"])
            for _ in range(rng.randint(1, 10))
        )
        words.append(w)
    weights = [rng.randint(1, 5) for _ in words]

    g = [list(w) for w in words]
    r = [list(w) for w in words]
    for _ in range(6):
        cg = count_pairs(g, weights)
        cr = count_pairs(r, weights)
        assert cg == cr
        if not cg:
            break
        # argmax with the suite tie-break: count desc, then (l, r) asc
        best = min(cg.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        g = [greedy_merge(t, *best) for t in g]
        r = [replace_merge(t, *best) for t in r]
        assert g == r


@pytest.mark.parametrize(
    "tokens,left,right,expected",
    [
        # overlapping run: only non-overlapping LTR occurrences merge
        (["a", "a", "a"], "a", "a", ["aa", "a"]),
        (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
        (["b", "a", "a", "a"], "a", "a", ["b", "aa", "a"]),
        # merged output equals the left symbol of a later pair — must
        # NOT cascade within the same pass
        (["a", "b", "b"], "a", "b", ["ab", "b"]),
        # multi-char symbols sharing prefixes
        (["ab", "b", "a", "ab"], "ab", "b", ["abb", "a", "ab"]),
        (["a", "ab", "b"], "a", "ab", ["aab", "b"]),
    ],
)
def test_merge_semantics_pinned_cases(tokens, left, right, expected):
    assert greedy_merge(tokens, left, right) == expected
    assert replace_merge(tokens, left, right) == expected
