"""Pure-Python Aho-Corasick automaton for batched mention detection.

Built once per executor from a broadcast alias list and run over Arrow
batches of page text inside ``mapInPandas`` — the per-document cost is
O(len(text)), independent of dictionary size, which is what makes
mention detection over 10^12 documents tractable (a regex alternation
over 100k aliases is not).

The container has no pyahocorasick wheel; this implementation is the
classic goto/fail/output construction (Aho & Corasick, CACM 1975).
Matches are token-boundary checked so "Kalo 1" doesn't fire inside
"Kalo 10".
"""

from __future__ import annotations

import re


class AhoCorasick:
    __slots__ = ("goto", "fail", "out")

    def __init__(self, patterns: list[str]):
        # goto: list of dict char → state; out: state → list of pattern lengths
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[str]] = [[]]
        for pat in patterns:
            if not pat:
                continue
            s = 0
            for ch in pat:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].append(pat)

        # BFS failure links
        from collections import deque

        self.fail = [0] * len(self.goto)
        q = deque()
        for ch, s in self.goto[0].items():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != s else 0
                if self.fail[s]:
                    self.out[s] = self.out[s] + self.out[self.fail[s]]

    def finditer(self, text: str):
        """Yield (start, end, pattern) for every dictionary hit."""
        s = 0
        goto = self.goto
        fail = self.fail
        out = self.out
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                for pat in out[s]:
                    yield (i - len(pat) + 1, i + 1, pat)


def _is_word_char(c: str) -> bool:
    return c.isalnum() or c in "_-"


def find_mentions(text: str, automaton: AhoCorasick) -> list[tuple[int, int, str]]:
    """Token-boundary-checked, longest-match-preferred dictionary hits."""
    raw = []
    for start, end, pat in automaton.finditer(text):
        if start > 0 and _is_word_char(text[start - 1]):
            continue
        if end < len(text) and _is_word_char(text[end]):
            continue
        raw.append((start, end, pat))
    if not raw:
        return raw
    # Prefer longest match at overlapping spans (sort by start, then -len).
    raw.sort(key=lambda m: (m[0], -(m[1] - m[0])))
    kept: list[tuple[int, int, str]] = []
    last_end = -1
    for m in raw:
        if m[0] >= last_end:
            kept.append(m)
            last_end = m[1]
    return kept


class TokenDictMatcher:
    """Word-level dictionary matcher — the cache-friendly fast path.

    Aliases are (almost always) sequences of whitespace tokens, so the
    automaton can be a single dict keyed on the FIRST token with
    candidate continuations checked inline: one hash lookup per token
    instead of one trie transition per character. ~10× less memory
    traffic per input byte than the char-level automaton, which matters
    on bandwidth-bound hosts (measured: char-trie AC stops scaling past
    ~8 cores on this class of VM; this scales).

    Same output contract as find_mentions: token-boundary matches,
    longest match first, non-overlapping, (start, end, pattern) spans.
    """

    __slots__ = ("index",)
    _TOK = re.compile(r"\S+")

    def __init__(self, patterns: list[str] | tuple[str, ...]):
        index: dict[str, list[tuple[str, ...]]] = {}
        for p in patterns:
            toks = tuple(p.split())
            if not toks:
                continue
            index.setdefault(toks[0], []).append(toks)
        for cands in index.values():
            cands.sort(key=len, reverse=True)
        self.index = index

    def find(self, text: str) -> list[tuple[int, int, str]]:
        # words in one C pass; spans materialized lazily per hit from
        # the match objects (most tokens miss the index entirely, so
        # avoid building 3-tuples for every token)
        matches = self._TOK.findall(text)
        out: list[tuple[int, int, str]] = []
        i, n = 0, len(matches)
        index = self.index
        get = index.get
        hits_idx: list[tuple[int, int, str]] = []
        while i < n:
            cands = get(matches[i])
            if cands:
                for c in cands:
                    L = len(c)
                    if i + L <= n and all(
                        matches[i + k] == c[k] for k in range(1, L)
                    ):
                        hits_idx.append((i, i + L - 1, " ".join(c)))
                        i += L
                        break
                else:
                    i += 1
            else:
                i += 1
        if not hits_idx:
            return out
        # one finditer pass to resolve char offsets of hit tokens only
        spans = [m.span() for m in self._TOK.finditer(text)]
        for i0, i1, pat in hits_idx:
            out.append((spans[i0][0], spans[i1][1], pat))
        return out


_AUTOMATON_CACHE: dict[int, AhoCorasick] = {}
_TOKEN_CACHE: dict[int, TokenDictMatcher] = {}


def token_matcher_for(patterns: tuple[str, ...] | list[str]) -> TokenDictMatcher:
    key = id(patterns)
    m = _TOKEN_CACHE.get(key)
    if m is None:
        m = TokenDictMatcher(patterns)
        _TOKEN_CACHE.clear()
        _TOKEN_CACHE[key] = m
    return m


def automaton_for(patterns: tuple[str, ...] | list[str]) -> AhoCorasick:
    """Executor-local cache: one automaton per distinct dictionary object."""
    key = id(patterns)
    a = _AUTOMATON_CACHE.get(key)
    if a is None:
        a = AhoCorasick(list(patterns))
        _AUTOMATON_CACHE.clear()  # hold at most one — dictionaries are big
        _AUTOMATON_CACHE[key] = a
    return a
