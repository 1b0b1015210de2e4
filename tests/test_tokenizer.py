"""BPE training — Spark result vs a pure-Python reference implementation
with identical tie-breaks (freq DESC, x ASC, y ASC) and greedy
left-to-right non-overlapping merges."""

from collections import Counter

from bingcrawler_spark.dataops import tokenizer as TK


def py_bpe(texts, k, n_words=200, max_len=16):
    cnt = Counter(
        w for t in texts for w in t.split(" ") if w and len(w) <= max_len
    )
    hist = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:n_words]
    state = {w: list(w) for w, _ in hist}
    freqs = dict(hist)
    out = []
    for r in range(1, k + 1):
        pc = Counter()
        for w, toks in state.items():
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += freqs[w]
        if not pc:
            break
        (x, y), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((r, x, y, f))
        for w, toks in state.items():
            new, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == x and toks[i + 1] == y:
                    new.append(x + y)
                    i += 2
                else:
                    new.append(toks[i])
                    i += 1
            state[w] = new
    return out


def test_bpe_hand_corpus(spark):
    """'low lower lowest' classic: 'lo' then 'low' merge first; the
    repeated-letter word exercises the overlapping-run greedy rule."""
    texts = [
        "low low low lower lowest",
        "low lower newer newer",
        "aaaa aaaa banana",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    want = py_bpe(texts, k=8)
    got = [(r.round, r.x, r.y, r.freq)
           for r in TK.bpe_train(df, k=8).orderBy("round").collect()]
    assert got == want
    # the overlapping-run case really happened: some round merged a pair
    # with x == y (from 'aaaa'), and greedy kept it non-overlapping
    assert any(x == y for _, x, y, _ in want)


def test_bpe_matches_python_on_synthetic_docs(spark, sf_dir):
    sample = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    texts = [r.text for r in sample.collect()]
    want = py_bpe(texts, k=5, n_words=80)
    got = [(r.round, r.x, r.y, r.freq)
           for r in TK.bpe_train(sample, k=5, n_words=80)
           .orderBy("round").collect()]
    assert got == want


def py_bpe_encode(texts, k, n_words=200, max_len=16):
    """Per-doc BPE token counts with the same training + OOV-chars rule."""
    merges = py_bpe(texts, k, n_words, max_len)
    vocab_state = {}

    def apply(word):
        toks = vocab_state.get(word)
        if toks is None:
            toks = list(word)
            for _, x, y, _ in merges:
                new, i = [], 0
                while i < len(toks):
                    if i + 1 < len(toks) and toks[i] == x and toks[i + 1] == y:
                        new.append(x + y)
                        i += 2
                    else:
                        new.append(toks[i])
                        i += 1
                toks = new
            vocab_state[word] = toks
        return len(toks)

    # mirror the engine: only trained (top-n_words, len<=max_len) words get
    # merged; everything else counts characters
    cnt = Counter(w for t in texts for w in t.split(" ") if w and len(w) <= max_len)
    trained = {w for w, _ in
               sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:n_words]}
    out = {}
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        out[i] = sum(apply(w) if w in trained else len(w) for w in words)
    return out


def test_bpe_encode_counts_match_python(spark):
    texts = [
        "low low lower lowest newer",
        "aaaa aaaa banana low",
        "zz qq zz verylongunseenword",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    want = py_bpe_encode(texts, k=6)
    got = {r.doc_id: r.bpe_tokens
           for r in TK.bpe_encode_counts(df, k=6).collect()}
    assert got == want
    # merging strictly reduced at least one doc below its char count
    charcounts = {i: sum(len(w) for w in t.split(" ") if w)
                  for i, t in enumerate(texts)}
    assert any(got[i] < charcounts[i] for i in got)
