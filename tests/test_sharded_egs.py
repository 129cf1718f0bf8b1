"""Streaming sharded egs: coverage, determinism, bounded memory, and
bit-for-bit equality between streamed and in-memory training
(ref: steps/nnet2/get_egs.sh + nnet-copy-egs/nnet-shuffle-egs —
SURVEY.md §2.1 nnet2 egs pipeline row)."""

import os
import tracemalloc

import numpy as np
import pytest

from kaldi_cnn_tpu.train.sharded_egs import (
    InMemoryShards, ShardedEgs, ShardedEgsWriter, StreamingEgsBatcher,
    write_sharded_egs)


def _make_store(tmp_path, n_rows=3000, dim=20, num_shards=8, seed=0,
                block=257):
    rng = np.random.default_rng(seed)
    w = ShardedEgsWriter(str(tmp_path / "egs"), num_shards, seed)
    all_x, all_y = [], []
    for i in range(0, n_rows, block):
        n = min(block, n_rows - i)
        x = rng.normal(size=(n, dim)).astype(np.float32)
        # row id hidden in column 0 for exact-coverage accounting
        x[:, 0] = np.arange(i, i + n)
        y = rng.integers(0, 10, n).astype(np.int32)
        all_x.append(x)
        all_y.append(y)
        w.add(x, y)
    return w.finalize(), np.concatenate(all_x), np.concatenate(all_y)


def test_shards_cover_all_rows_with_global_shuffle(tmp_path):
    store, x, y = _make_store(tmp_path)
    assert store.num_shards == 8
    assert len(store) == len(y)
    assert min(store.counts) > 0
    got = np.sort(np.concatenate(
        [store.load_shard(i)[0][:, 0] for i in range(8)]))
    np.testing.assert_array_equal(got, np.arange(len(y)))
    # multinomial shard assignment + within-shard shuffle = global
    # shuffle: shard 0 must not be the first rows in order
    s0 = store.load_shard(0)[0][:, 0]
    assert not np.array_equal(s0, np.sort(s0))


def test_epoch_covers_every_example_once(tmp_path):
    store, x, y = _make_store(tmp_path)
    b = StreamingEgsBatcher(store, minibatch_size=256, seed=3)
    seen = []
    n_batches = 0
    for bx, by, bw in b.epoch(0):
        assert bx.shape == (256, 20) and by.shape == (256,)
        seen.append(bx[bw > 0, 0])
        n_batches += 1
    assert n_batches == b.num_batches()
    got = np.sort(np.concatenate(seen))
    np.testing.assert_array_equal(got, np.arange(len(y)))


def test_epoch_deterministic_and_resumable(tmp_path):
    store, _, _ = _make_store(tmp_path)
    b = StreamingEgsBatcher(store, minibatch_size=256, seed=3)
    full = list(b.epoch(1))
    again = list(b.epoch(1))
    for (a1, a2, a3), (b1, b2, b3) in zip(full, again):
        np.testing.assert_array_equal(a1, b1)
        np.testing.assert_array_equal(a2, b2)
        np.testing.assert_array_equal(a3, b3)
    # resume mid-epoch: identical tail
    tail = list(b.epoch(1, start_batch=5))
    assert len(tail) == len(full) - 5
    for (a1, a2, a3), (b1, b2, b3) in zip(full[5:], tail):
        np.testing.assert_array_equal(a1, b1)
        np.testing.assert_array_equal(a2, b2)
        np.testing.assert_array_equal(a3, b3)
    # different epochs differ
    other = list(b.epoch(2))
    assert not np.array_equal(full[0][0], other[0][0])


def test_streaming_peak_memory_bounded_below_total(tmp_path):
    """VERDICT round-2 item 4 'done' bar: stream from >=8 shards with
    peak RSS bounded below total egs size."""
    n_rows, dim = 16384, 256           # 16 MB of egs total
    store, _, _ = _make_store(tmp_path, n_rows=n_rows, dim=dim,
                              num_shards=16)
    total_bytes = n_rows * dim * 4
    b = StreamingEgsBatcher(store, minibatch_size=256, seed=0)
    tracemalloc.start()
    for bx, by, bw in b.epoch(0):
        pass
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # streaming holds a handful of ~1-shard buffers (current shard's
    # permuted copy, the prefetched next shard, carry, batch) — a
    # constant independent of shard count, so the ratio to the full
    # store shrinks as the store grows (here: <= ~5/16)
    assert peak < total_bytes * 0.5, (peak, total_bytes)


def test_streamed_training_matches_inmemory_bitforbit(tmp_path):
    """Same seed, same store: training from disk-streamed shards equals
    training from the identical shards held in memory, bit for bit —
    prefetch timing and IO cannot change the batch sequence."""
    import jax
    from kaldi_cnn_tpu.models.components import (
        AffineComponent, SoftmaxComponent, TanhComponent)
    from kaldi_cnn_tpu.models.nnet import Nnet
    from kaldi_cnn_tpu.train.egs import Egs
    from kaldi_cnn_tpu.train.trainer import TrainConfig, train_nnet

    store, x, y = _make_store(tmp_path, n_rows=2000, dim=20)
    mem = InMemoryShards([store.load_shard(i)
                          for i in range(store.num_shards)])
    egs_valid = Egs(x[:256], y[:256], np.ones(256, np.float32))
    cfg = TrainConfig(num_epochs=2, minibatch_size=256,
                      initial_learning_rate=0.02,
                      final_learning_rate=0.01, seed=5,
                      combine_num_models=1)
    net = Nnet([AffineComponent(20, 16), TanhComponent(16),
                AffineComponent(16, 10), SoftmaxComponent(10)])
    p_stream, _ = train_nnet(
        net, None, egs_valid, cfg,
        batcher=StreamingEgsBatcher(store, 256, seed=5))
    p_mem, _ = train_nnet(
        net, None, egs_valid, cfg,
        batcher=StreamingEgsBatcher(mem, 256, seed=5))
    for a, b in zip(jax.tree_util.tree_leaves(p_stream),
                    jax.tree_util.tree_leaves(p_mem)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_write_sharded_egs_roundtrip(tmp_path):
    def blocks():
        rng = np.random.default_rng(0)
        for _ in range(4):
            yield (rng.normal(size=(100, 8)).astype(np.float32),
                   rng.integers(0, 5, 100).astype(np.int32), None)

    store = write_sharded_egs(str(tmp_path / "e"), blocks(),
                              num_shards=3, seed=1)
    assert len(store) == 400
    reloaded = ShardedEgs(str(tmp_path / "e"))
    assert len(reloaded) == 400
    egs = reloaded.load_all()
    assert egs.x.shape == (400, 8)
    np.testing.assert_array_equal(egs.weights, np.ones(400, np.float32))
