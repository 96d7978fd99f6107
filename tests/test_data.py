"""Data pipeline tests: CIFAR loaders and the NMT batching stack."""

import numpy as np
import pytest

from quantized_distillation_tpu.data import (
    BOS,
    EOS,
    PAD,
    Vocab,
    augment,
    batches,
    build_vocab,
    load_cifar,
    nmt_batches,
    toy_corpus,
)


class TestCIFAR:
    def test_synthetic_shapes_and_determinism(self):
        ds1 = load_cifar(10, train=True, data_dir="/nonexistent", synthetic_size=256)
        ds2 = load_cifar(10, train=True, data_dir="/nonexistent", synthetic_size=256)
        assert ds1.source == "synthetic"
        assert ds1.images.shape == (256, 32, 32, 3)
        np.testing.assert_array_equal(ds1.images, ds2.images)

    def test_train_test_differ(self):
        tr = load_cifar(10, train=True, data_dir="/nonexistent", synthetic_size=64)
        te = load_cifar(10, train=False, data_dir="/nonexistent", synthetic_size=64)
        assert not np.allclose(tr.images, te.images)

    def test_synthetic_learnable(self):
        # nearest-class-template classification beats chance by a wide margin
        ds = load_cifar(10, train=True, data_dir="/nonexistent", synthetic_size=512)
        means = np.stack(
            [ds.images[ds.labels == c].mean(0) for c in range(10)]
        ).reshape(10, -1)
        x = ds.images.reshape(len(ds.labels), -1)
        pred = np.argmin(
            ((x[:, None, :] - means[None]) ** 2).sum(-1), axis=1
        )
        assert (pred == ds.labels).mean() > 0.5

    def test_batches_and_augment(self):
        ds = load_cifar(100, train=True, data_dir="/nonexistent", synthetic_size=100)
        got = list(batches(ds, 32, train_augment=True))
        assert len(got) == 3
        assert got[0]["image"].shape == (32, 32, 32, 3)
        assert got[0]["label"].dtype == np.int32


class TestVocab:
    def test_build_and_roundtrip(self):
        sents = [["a", "b", "a"], ["c", "a"]]
        v = build_vocab(sents)
        assert v.itos[:4] == ["<pad>", "<s>", "</s>", "<unk>"]
        assert v.itos[4] == "a"  # most frequent first
        ids = v.encode(["a", "zzz", "c"])
        assert ids[1] == 3  # unk
        assert v.decode(ids) == ["a", "<unk>", "c"]


class TestToyCorpus:
    def test_bijection_stable_across_seeds(self):
        # same mapping must hold for train/test splits with different seeds
        a = toy_corpus(n=50, vocab_size=30, seed=0)
        b = toy_corpus(n=50, vocab_size=30, seed=7)
        map_a = {}
        for s, t in zip(a.src, a.tgt):
            for x, y in zip(s, t[::-1]):
                map_a.setdefault(x, y)
                assert map_a[x] == y
        for s, t in zip(b.src, b.tgt):
            for x, y in zip(s, t[::-1]):
                if x in map_a:
                    assert map_a[x] == y

    def test_target_is_reversed_source(self):
        c = toy_corpus(n=20, vocab_size=30, seed=0)
        for s, t in zip(c.src, c.tgt):
            assert len(s) == len(t)


class TestNMTBatches:
    def test_batch_invariants(self):
        c = toy_corpus(n=200, vocab_size=40, min_len=3, max_len=12, seed=0)
        seen = set()
        for b in nmt_batches(c, 16):
            B, Ts = b["src"].shape
            _, Tt = b["tgt_in"].shape
            assert Ts in (8, 16) and Tt in (8, 16)
            for j in range(B):
                i = int(b["index"][j])
                seen.add(i)
                L = int(b["src_len"][j])
                assert list(b["src"][j][:L]) == c.src[i]
                assert (b["src"][j][L:] == PAD).all()
                t = c.tgt[i]
                assert b["tgt_in"][j][0] == BOS
                assert list(b["tgt_in"][j][1 : len(t) + 1]) == t
                assert list(b["tgt_out"][j][: len(t)]) == t
                assert b["tgt_out"][j][len(t)] == EOS
                assert b["tgt_mask"][j].sum() == len(t) + 1
        assert len(seen) == 200  # every sentence delivered exactly once

    def test_drop_remainder(self):
        c = toy_corpus(n=100, vocab_size=40, min_len=3, max_len=6, seed=0)
        for b in nmt_batches(c, 16, drop_remainder=True):
            assert b["src"].shape[0] == 16


def test_toy_corpus_zipf_head_heavy():
    from quantized_distillation_tpu.data import toy_corpus

    uni = toy_corpus(n=400, vocab_size=2000, seed=0)
    zpf = toy_corpus(n=400, vocab_size=2000, seed=0, zipf=1.1)
    import collections

    def top_share(corpus):
        c = collections.Counter(w for s in corpus.src for w in s)
        total = sum(c.values())
        return sum(n for _, n in c.most_common(20)) / total

    # Zipf draws concentrate mass on the head; uniform draws don't
    assert top_share(zpf) > 3 * top_share(uni)
    # same bijection/language across distributions (seeded by vocab_size)
    assert len(zpf.src_vocab) == len(uni.src_vocab)
    assert zpf.src_vocab.decode([10, 11]) == uni.src_vocab.decode([10, 11])
