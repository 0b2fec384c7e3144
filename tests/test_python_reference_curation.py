"""Pure-Python reference checks for the curation-tier SQL-pair queries.

VERDICT r4: shared-SQL oracles (the same SQL text through Spark and
DuckDB) prove engine agreement, not algorithm correctness.  These tests
close that gap: each re-implements the operator's SEMANTIC DEFINITION
in plain Python over the raw sf0.001 parquet and asserts the Spark
query reproduces it value-for-value — a third, independent
implementation triangulating the two engines.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    return [(int(r["doc_id"]), r["text"], r["source"]) for r in t]


def _run(spark, name):
    import __spark_entry__ as em

    return [tuple(r) for r in em.queries()[name](spark, SF).collect()]


class TestGopherRules:
    def test_matches_python_reference(self, spark):
        per_rule = Counter()
        n = 0
        for _, text, _ in _docs():
            words = text.split(" ")
            nw, nc = len(words), len(text)
            r_minw = nw >= 20
            r_maxw = nw <= 35
            r_mwl = 3_000_000 <= ((nc - (nw - 1)) * 1_000_000) // nw <= 7_000_000
            r_stop = "the" in text.lower().split(" ")
            n += 1
            for rule, ok in [
                ("min_words", r_minw), ("max_words", r_maxw),
                ("mean_word_len", r_mwl), ("stopword", r_stop),
                ("ALL_RULES", r_minw and r_maxw and r_mwl and r_stop),
            ]:
                per_rule[rule] += int(ok)
        want = sorted(
            (rule, per_rule[rule], n - per_rule[rule])
            for rule in ["ALL_RULES", "max_words", "mean_word_len", "min_words", "stopword"]
        )
        assert _run(spark, "gopher_quality_rules") == want


class TestRepetitionFilter:
    def test_matches_python_reference(self, spark):
        rows = []
        for doc_id, text, _ in _docs():
            ws = text.lower().split(" ")
            if len(ws) < 2:
                continue
            grams = [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
            n_big, nd_big = len(grams), len(set(grams))
            uni = Counter(ws)
            n_words, top_c = sum(uni.values()), max(uni.values())
            dup = ((n_big - nd_big) * 1_000_000) // n_big
            top = (top_c * 1_000_000) // n_words
            rows.append((doc_id, dup, top, int(dup <= 200_000 and top <= 200_000)))
        rows.sort(key=lambda r: (-r[1], -r[2], r[0]))
        assert _run(spark, "repetition_filter") == rows[:20]


class TestDecontamination:
    def test_matches_python_reference(self, spark):
        def grams3(text):
            ws = text.lower().split(" ")
            if len(ws) < 3:
                return set()
            return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

        docs = _docs()
        ev = set().union(*(grams3(t) for d, t, _ in docs if d % 37 == 3))
        rows = []
        for doc_id, text, _ in docs:
            if doc_id % 37 == 3:
                continue
            g = grams3(text)
            if not g:
                continue
            n_contam = len(g & ev)
            rows.append(
                (doc_id, len(g), n_contam, (n_contam * 1_000_000) // len(g))
            )
        rows.sort(key=lambda r: (-r[3], r[0]))
        assert _run(spark, "decontaminate_ngram_overlap") == rows[:20]


class TestDataCard:
    def test_matches_python_reference(self, spark):
        per = {}
        for doc_id, text, source in _docs():
            s = per.setdefault(source, {"n": 0, "toks": 0, "chars": 0, "hashes": []})
            s["n"] += 1
            s["toks"] += len(text.split(" "))
            s["chars"] += len(text)
            s["hashes"].append(hashlib.md5(text.encode()).hexdigest())
        total = sum(s["toks"] for s in per.values())
        want = [
            (
                src,
                s["n"],
                s["toks"],
                (s["toks"] * 1_000_000) // total,
                s["n"] - len(set(s["hashes"])),
                (s["chars"] * 100) // s["n"],
            )
            for src, s in sorted(per.items())
        ]
        assert _run(spark, "data_card_by_source") == want


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestTokenBudgetMix:
    def test_matches_python_reference(self, spark):
        budget = 500
        per = {}
        for doc_id, text, source in _docs():
            per.setdefault(source, []).append(
                (hashlib.md5(str(doc_id).encode()).hexdigest(), doc_id,
                 len(text.split(" ")))
            )
        want = []
        for source in sorted(per):
            docs = sorted(per[source])
            cum = used = kept = chk = 0
            for _, doc_id, n in docs:
                cum += n
                if cum <= budget:
                    kept += 1
                    used += n
                    chk += doc_id
            want.append(
                (source, len(docs), kept, used, (used * 1_000_000) // budget, chk)
            )
        assert _run(spark, "token_budget_mix") == want


class TestBigramLmSurprisal:
    def test_matches_python_reference(self, spark):
        import math

        def bigrams(text):
            ws = text.lower().split(" ")
            return list(zip(ws, ws[1:]))

        docs = _docs()
        c12, c1, vocab = Counter(), Counter(), set()
        for doc_id, text, _ in docs:
            if doc_id % 10 < 8:
                for w1, w2 in bigrams(text):
                    c12[(w1, w2)] += 1
                    c1[w1] += 1
                    vocab.add(w1)
                    vocab.add(w2)
        nv = len(vocab)
        rows = []
        for doc_id, text, _ in docs:
            if doc_id % 10 < 8:
                continue
            bgs = bigrams(text)
            if not bgs:
                continue
            s_sum = 0
            for bg in bgs:
                x = math.log((c1[bg[0]] + nv) / (c12[bg] + 1))
                s_sum += math.floor(x * 10_000 + 0.5)  # round half-up, x >= 0
            rows.append((doc_id, len(bgs), s_sum // len(bgs)))
        rows.sort(key=lambda r: (-r[2], r[0]))
        assert _run(spark, "bigram_lm_surprisal") == rows[:20]


class TestBoilerplateChunks:
    def test_matches_python_reference(self, spark):
        def chunks(text):
            ws = text.lower().split(" ")
            return [" ".join(ws[i : i + 2]) for i in range(0, len(ws) - 1, 2)]

        docs = _docs()
        df = Counter()
        for doc_id, text, _ in docs:
            for c in set(chunks(text)):
                df[c] += 1
        ranked = sorted(df, key=lambda c: (-df[c], c))
        boiler = set(ranked[: len(ranked) // 10])
        rows = []
        for doc_id, text, _ in docs:
            ch = chunks(text)
            if not ch:
                continue
            nb = sum(1 for c in ch if c in boiler)
            rows.append(
                (doc_id, len(ch), nb, ((len(ch) - nb) * 1_000_000) // len(ch))
            )
        rows.sort(key=lambda r: (-r[2], r[0]))
        assert _run(spark, "boilerplate_chunks") == rows[:20]


class TestSourceCappedSample:
    def test_matches_python_reference(self, spark):
        per = {}
        for doc_id, text, source in _docs():
            per.setdefault(source, []).append((-len(text.split(" ")), doc_id))
        want = []
        for source in sorted(per):
            docs = sorted(per[source])
            kept = docs[:10]
            want.append(
                (source, len(docs), len(kept),
                 sum(-n for n, _ in kept), sum(d for _, d in kept))
            )
        assert _run(spark, "source_capped_sample") == want


def _half_away(x: float) -> int:
    # SQL round(): half away from zero (Python round() is banker's)
    import math

    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


class TestDsirImportance:
    def test_matches_python_reference(self, spark):
        import math

        def bigrams(text):
            ws = text.lower().split(" ")
            return [" ".join(p) for p in zip(ws, ws[1:])]

        docs = _docs()
        ct, cr = Counter(), Counter()
        vocab = set()
        for doc_id, text, _ in docs:
            bgs = bigrams(text)
            vocab.update(bgs)
            (ct if doc_id % 37 == 3 else cr).update(bgs)
        nt, nr, nv = sum(ct.values()), sum(cr.values()), len(vocab)
        s = {
            g: _half_away(
                math.log(((ct[g] + 1) / (nt + nv)) / ((c + 1) / (nr + nv))) * 10_000
            )
            for g, c in cr.items()
        }
        rows = []
        for doc_id, text, _ in docs:
            if doc_id % 37 == 3:
                continue
            bgs = bigrams(text)
            if not bgs:
                continue
            ssum = sum(s[g] for g in bgs)
            rows.append((doc_id, len(bgs), _half_away(ssum / len(bgs))))
        rows.sort(key=lambda r: (-r[2], r[0]))
        assert _run(spark, "dsir_importance_weights") == rows[:20]


class TestSourceUnigramKl:
    def test_matches_python_reference(self, spark):
        import math

        docs = _docs()
        cs, ns, ctok = Counter(), Counter(), Counter()
        for _, text, source in docs:
            for tok in text.lower().split(" "):
                cs[(source, tok)] += 1
                ns[source] += 1
                ctok[tok] += 1
        n = sum(ns.values())
        want = []
        for source in sorted(ns):
            terms = sum(
                c * _half_away(math.log((c * n) / (ns[source] * ctok[tok])) * 10_000)
                for (src, tok), c in cs.items()
                if src == source
            )
            want.append((source, ns[source], _half_away(terms / ns[source])))
        assert _run(spark, "source_unigram_kl") == want


class TestEntityResolution:
    def test_matches_python_reference(self, spark):
        cust = pq.read_table(f"{SF}/customer.parquet").to_pylist()
        nat = {
            int(r["n_nationkey"]): r["n_name"]
            for r in pq.read_table(f"{SF}/nation.parquet").to_pylist()
        }
        names = sorted(nat.values())
        per = {}
        for c in cust:
            key, name = int(c["c_custkey"]), nat[int(c["c_nationkey"])]
            k = key % len(name)
            mention = name[:k] + name[k + 1 :]
            cand = [
                n for n in names
                if (n[:1] == mention[:1] or n[-1:] == mention[-1:])
                and _levenshtein(mention, n) <= 2
            ]
            best = min(
                cand, key=lambda n: (_levenshtein(mention, n), n), default=None
            )
            s = per.setdefault(name, [0, 0, 0])
            s[0] += 1
            if best is not None:
                s[1] += 1
                s[2] += int(best == name)
        want = [(n, *per[n]) for n in sorted(per)]
        assert _run(spark, "entity_resolution") == want


class TestParagraphDedup:
    def test_matches_python_reference(self, spark):
        # corpus-global keep-first: a chunk occurrence survives iff no
        # occurrence with a smaller (doc_id, 1-based word position)
        first: dict[str, tuple[int, int]] = {}
        occ = []
        for doc_id, text, source in sorted(_docs()):
            ws = text.lower().split(" ")
            if len(ws) < 2:
                continue
            for pos in range(1, len(ws) - 1 + 1, 2):
                c = " ".join(ws[pos - 1 : pos + 1])
                occ.append((source, doc_id, pos, c))
                if c not in first:
                    first[c] = (doc_id, pos)
        per: dict[str, list[int]] = {}
        for source, doc_id, pos, c in occ:
            per.setdefault(source, [0, 0])
            per[source][0] += 1
            per[source][1] += first[c] == (doc_id, pos)
        want = [
            (s, n, k, (k * 1_000_000) // n)
            for s, (n, k) in sorted(per.items())
        ]
        assert _run(spark, "paragraph_dedup") == want


class TestUnigramTokenizer:
    def test_matches_python_reference(self, spark):
        import math

        L, W, MIN = 4, 12, 2
        wt = Counter()
        for _, text, _ in _docs():
            for w in text.lower().split(" "):
                if 1 <= len(w) <= W:
                    wt[w] += 1
        cnt = Counter()
        for w, n in wt.items():
            for i in range(1, len(w) + 1):
                for j in range(max(0, i - L), i):
                    cnt[w[j:i]] += n
        vocab = {p: c for p, c in cnt.items() if c >= MIN or len(p) == 1}
        total = sum(vocab.values())
        enc = {
            p: int(math.floor(math.log(total / c) * 10000 + 0.5)) * 1024 + 1
            for p, c in vocab.items()
        }
        rows = []
        for w, n in wt.items():
            best = [0] + [None] * len(w)
            for i in range(1, len(w) + 1):
                cands = [
                    best[j] + enc[w[j:i]]
                    for j in range(max(0, i - L), i)
                    if best[j] is not None and w[j:i] in enc
                ]
                best[i] = min(cands) if cands else None
            b = best[len(w)]
            rows.append((w, n, b // 1024, b % 1024))
        rows.sort(key=lambda r: (-r[2], r[0]))
        assert _run(spark, "unigram_tokenizer_costs") == rows[:20]

    def test_single_chars_always_segmentable(self, spark):
        # a word whose every multi-char substring is corpus-unique must
        # still segment (char fallback): build it synthetically
        from ffp_spark.textops import unigram_token_stats

        df = spark.createDataFrame(
            [(0, "qzxv aa aa bb bb")], "doc_id long, text string"
        )
        got = {
            r.word: (r.cost_q, r.n_tokens)
            for r in unigram_token_stats(df).collect()
        }
        # qzxv: 4 single-char pieces, each count 1 (kept as chars)
        assert got["qzxv"][1] == 4
        # aa / bb: the 2-char piece (count 2 >= min) beats two chars
        assert got["aa"][1] == 1 and got["bb"][1] == 1
