#!/usr/bin/env python3
"""Independent reference BPE (Sennrich et al. 2016) over the fixture
corpus — pins the golden oracle rows for bpe_merges / bpe_encode_stats.
Symbols: characters + a final '</w>' marker symbol per word.
Pair counts weighted by word frequency, overlapping occurrences counted
(the paper's get_stats). Tie-break: (freq DESC, left ASC, right ASC).
"""
import sys, duckdb
from collections import Counter

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NUM_MERGES = 12
MIN_FREQ = 2

rows = duckdb.sql(f"SELECT lang, text FROM '{sf}/documents.parquet'").fetchall()

wordfreq = Counter()
for _, text in rows:
    for w in text.split(" "):
        wordfreq[w] += 1

# dict: word -> (symbols tuple, freq)
dict_syms = {w: tuple(list(w) + ["</w>"]) for w in wordfreq}

def pair_stats():
    c = Counter()
    for w, syms in dict_syms.items():
        f = wordfreq[w]
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += f
    return c

def merge_word(syms, a, b, ab):
    out, prev = [], None
    for x in syms:
        if prev is None:
            prev = x
        elif prev == a and x == b:
            prev = ab
        else:
            out.append(prev)
            prev = x
    if prev is not None:
        out.append(prev)
    return tuple(out)

merges = []
for rank in range(1, NUM_MERGES + 1):
    stats = pair_stats()
    if not stats:
        break
    (a, b), f = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    if f < MIN_FREQ:
        break
    merges.append((rank, a, b, f))
    ab = a + b
    dict_syms = {w: merge_word(s, a, b, ab) for w, s in dict_syms.items()}

print("-- bpe_merges golden rows")
for rank, a, b, f in merges:
    print(f"  ({rank}, '{a}', '{b}', {f}),")

# encode: apply merges by rank (lowest rank first, all occurrences, repeat)
ranks = {(a, b): r for r, a, b, _ in merges}

def encode(word):
    syms = tuple(list(word) + ["</w>"])
    while True:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        cand = [(ranks[p], p) for p in pairs if p in ranks]
        if not cand:
            return syms
        _, (a, b) = min(cand)
        syms = merge_word(syms, a, b, a + b)

enc_cache = {w: len(encode(w)) for w in wordfreq}

stats = {}
for lang, text in rows:
    words = text.split(" ")
    ntok = sum(enc_cache[w] for w in words)
    nch = len(text)
    d = stats.setdefault(lang, [0, 0, 0])
    d[0] += 1
    d[1] += ntok
    d[2] += nch

print("-- bpe_encode_stats golden rows (lang, n_docs, total_bpe_tokens, total_chars)")
for lang in sorted(stats):
    n, t, c = stats[lang]
    print(f"  ('{lang}', {n}, {t}, {c}),")

# symbol vocabulary of the trained dict (word freq x per-word occurrences)
vocab = Counter()
for w, syms in dict_syms.items():
    f = wordfreq[w]
    for s in syms:
        vocab[s] += f
print("-- bpe_vocab golden rows (symbol, n_occurrences)")
for s in sorted(vocab):
    print(f"  ('{s}', {vocab[s]}),")

# token-id encode: id = rank in sorted trained vocab; per-doc rolling
# checksum h <- (h*1000003 + id + 1) mod 2^61, xor'd per language
vocab_ids = {s: i for i, s in enumerate(sorted(vocab))}
MASK = (1 << 61) - 1
enc_syms = {w: encode(w) for w in wordfreq}
idstats = {}
for lang, text in rows:
    h = 0
    n = 0
    for w in text.split(" "):
        for s in enc_syms[w]:
            h = (h * 1000003 + vocab_ids.get(s, -1) + 1) & MASK
            n += 1
    d = idstats.setdefault(lang, [0, 0])
    d[0] += n
    d[1] ^= h
print("-- bpe_encode_ids golden rows (lang, total_ids, hash_xor)")
for lang in sorted(idstats):
    n, x = idstats[lang]
    print(f"  ('{lang}', {n}, {x}),")
