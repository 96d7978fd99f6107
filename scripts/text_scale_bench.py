"""Prove the raw-text pipeline at corpus scale (round-2 VERDICT weak #6).

Generates a synthetic ~N-sentence raw parallel corpus (Zipf-distributed
lexicon with punctuation/number/contraction structure, so the Moses
tokenizer and BPE learner see realistic text), then times the REAL user
path — ``data.translation.load_raw_parallel`` with learned BPE — end to end,
with a stage breakdown and peak RSS.

The question this answers: is WMT13-size preprocessing (~4.5M pairs)
feasible the day real data lands? ``learn_bpe`` is incremental (cost scales
with unique WORDS, not corpus size), so the expectation is yes; this script
replaces that expectation with a wall-clock number.

Run (CPU, no jax needed):  python scripts/text_scale_bench.py --n 1000000
Prints one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_corpus(path_src: str, path_tgt: str, n: int, seed: int) -> None:
    """Zipf-word synthetic raw text with punctuation/numeric structure."""
    import numpy as np

    rng = np.random.default_rng(seed)
    # ~30k-type lexicon per side (WMT13-like vocabulary scale pre-BPE)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))

    def lexicon(m, rng):
        words = []
        lens = rng.integers(2, 12, m)
        for L in lens:
            words.append("".join(rng.choice(letters, L)))
        return np.array(words)

    lex_s, lex_t = lexicon(30000, rng), lexicon(30000, rng)
    zipf_p = 1.0 / np.arange(1, 30001)
    zipf_p /= zipf_p.sum()
    with open(path_src, "w") as fs, open(path_tgt, "w") as ft:
        for i in range(n):
            ln = int(rng.integers(5, 30))
            for lex, f in ((lex_s, fs), (lex_t, ft)):
                ws = list(lex[rng.choice(30000, ln, p=zipf_p)])
                if rng.random() < 0.15:
                    ws.insert(int(rng.integers(0, len(ws))), str(rng.integers(1, 5000)))
                if rng.random() < 0.1:
                    ws[-1] = ws[-1] + ","
                sent = " ".join(ws)
                if rng.random() < 0.05:
                    sent = sent.capitalize() + "?"
                else:
                    sent = sent.capitalize() + "."
                f.write(sent + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--merges", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from quantized_distillation_tpu.data.text import learn_bpe, moses_tokenize
    from quantized_distillation_tpu.data.translation import load_raw_parallel

    d = tempfile.mkdtemp(prefix="qdt_textbench_")
    ps, pt = os.path.join(d, "train.src"), os.path.join(d, "train.tgt")
    t0 = time.perf_counter()
    synth_corpus(ps, pt, args.n, args.seed)
    t_gen = time.perf_counter() - t0
    size_mb = (os.path.getsize(ps) + os.path.getsize(pt)) / 1e6
    print(f"corpus: {args.n} pairs, {size_mb:.0f}MB raw, generated in "
          f"{t_gen:.0f}s", file=sys.stderr)

    # stage breakdown on the src side
    t0 = time.perf_counter()
    with open(ps) as f:
        lines = [l.rstrip("\n") for l in f]
    t_read = time.perf_counter() - t0
    t0 = time.perf_counter()
    tok = [moses_tokenize(l, "de") for l in lines]
    t_tok = time.perf_counter() - t0
    t0 = time.perf_counter()
    bpe = learn_bpe(tok, args.merges)
    t_learn = time.perf_counter() - t0
    t0 = time.perf_counter()
    enc = [bpe.encode(s) for s in tok]
    t_enc = time.perf_counter() - t0
    n_tokens = sum(len(s) for s in tok)
    del lines, tok, enc

    # the real user path, end to end (both sides: tokenize + learn BPE +
    # encode + vocab build + id-encode)
    t0 = time.perf_counter()
    corpus, sp, tp = load_raw_parallel(
        ps, pt, bpe_merges=args.merges, max_len=64
    )
    t_e2e = time.perf_counter() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    out = {
        "pairs": args.n,
        "raw_mb": round(size_mb, 1),
        "src_tokens": n_tokens,
        "bpe_merges": args.merges,
        "stage_s": {
            "read": round(t_read, 1),
            "moses_tokenize": round(t_tok, 1),
            "learn_bpe": round(t_learn, 1),
            "bpe_encode": round(t_enc, 1),
        },
        "load_raw_parallel_e2e_s": round(t_e2e, 1),
        "peak_rss_gb": round(rss_gb, 2),
        "corpus_pairs_kept": len(corpus.src),
        "wmt13_projection_s": round(t_e2e * 4.5e6 / args.n, 0),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
