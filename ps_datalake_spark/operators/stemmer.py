"""Porter stemmer — the standard English suffix-stripping algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3), 1980).

Pure-Python implementation of the published algorithm, used by the
b37_stemming query through an Arrow-batched UDF (shipped by value).  The
oracle for that query is a literal table of input→stem pairs taken from the
paper's own worked examples, so the implementation is checked against the
algorithm's published behavior, not against itself.

Notation (paper §2): a consonant is a letter other than a,e,i,o,u and
other than y preceded by a consonant; a word has measure m when it reduces
to the form [C](VC)^m[V].
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Count VC sequences: [C](VC)^m[V]."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(stem: str) -> bool:
    return (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and _is_cons(stem, len(stem) - 1)
    )


def _ends_cvc(stem: str) -> bool:
    """*o: ends consonant-vowel-consonant, final consonant not w, x, y."""
    if len(stem) < 3:
        return False
    return (
        _is_cons(stem, len(stem) - 3)
        and not _is_cons(stem, len(stem) - 2)
        and _is_cons(stem, len(stem) - 1)
        and stem[-1] not in "wxy"
    )


def _replace_longest(word: str, rules, cond):
    """Apply the longest-suffix-matching rule whose condition passes.

    Per the paper, within a step only the rule with the LONGEST matching
    suffix is considered; if its condition fails, no rule in the step
    fires.  Returns (new_word, matched_suffix_found).
    """
    for suf, rep in sorted(rules, key=lambda r: -len(r[0])):
        if word.endswith(suf):
            stem = word[: len(word) - len(suf)]
            if cond(stem):
                return stem + rep, True
            return word, True
    return word, False


def porter_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    fired_2_3 = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            fired_2_3 = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            fired_2_3 = True
    if fired_2_3:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2 (m>0)
    w, _ = _replace_longest(
        w,
        [
            ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
            ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
            ("alli", "al"), ("entli", "ent"), ("eli", "e"),
            ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
            ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
            ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
            ("iviti", "ive"), ("biliti", "ble"),
        ],
        lambda stem: _measure(stem) > 0,
    )

    # Step 3 (m>0)
    w, _ = _replace_longest(
        w,
        [
            ("icate", "ic"), ("ative", ""), ("alize", "al"),
            ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""),
        ],
        lambda stem: _measure(stem) > 0,
    )

    # Step 4 (m>1); ION additionally requires stem ending s or t
    for suf in (
        "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
        "ion", "ism", "ate", "iti", "ous", "ive", "ize", "al", "er",
        "ic", "ou",
    ):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1 and (suf != "ion" or stem.endswith(("s", "t"))):
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
