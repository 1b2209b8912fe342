"""synthesize_mels: bucketing/no-recompile and per-item determinism."""

import jax.numpy as jnp
import numpy as np
import pytest

import jax
from flowavenet_tpu.config import tiny
from flowavenet_tpu.models.flowavenet import init_flowavenet
from flowavenet_tpu.synthesis.synthesize import (_jitted_reverse,
                                                 synthesize_mels)

CFG = tiny()


@pytest.fixture(scope="module")
def params():
    return init_flowavenet(jax.random.PRNGKey(0), CFG.model)


def _mel(frames, seed=0):
    return np.random.RandomState(seed).rand(
        frames, CFG.model.num_mels).astype(np.float32)


def test_bucketing_reuses_compiled_reverse(params):
    """Two different clip lengths in the same bucket share one compiled
    reverse (the in-training synthesis probe relies on this: a new eval clip
    length must not recompile)."""
    fn = _jitted_reverse(CFG.model, jnp.float32)
    synthesize_mels(params, CFG, [_mel(8)], bucket_frames=16)
    n_compiled = fn._cache_size()
    synthesize_mels(params, CFG, [_mel(6, seed=1)], bucket_frames=16)
    synthesize_mels(params, CFG, [_mel(13, seed=2)], bucket_frames=16)
    assert fn._cache_size() == n_compiled, \
        "same-bucket lengths must reuse the compiled reverse"


def test_per_item_seed_is_batch_invariant(params):
    """An item's audio depends only on (mel, seed, temp, bucket) — adding a
    companion to the batch must not change it."""
    mel = _mel(8)
    solo = synthesize_mels(params, CFG, [mel], seed=[5], bucket_frames=16)[0]
    with_pal = synthesize_mels(params, CFG, [_mel(6, seed=9), mel],
                               seed=[11, 5], bucket_frames=16)[1]
    np.testing.assert_array_equal(solo, with_pal)


def test_per_item_seed_and_temp_differ(params):
    mel = _mel(8)
    w = synthesize_mels(params, CFG, [mel, mel, mel],
                        seed=[1, 2, 2], temp=[None, None, 0.1],
                        bucket_frames=16)
    assert not np.array_equal(w[0], w[1]), "different seeds must differ"
    assert not np.array_equal(w[1], w[2]), "different temps must differ"


def test_scalar_seed_rows_distinct(params):
    """A scalar seed expands to distinct per-row noise (CLI behaviour)."""
    mel = _mel(8)
    w = synthesize_mels(params, CFG, [mel, mel], seed=3, bucket_frames=16)
    assert not np.array_equal(w[0], w[1])


def test_seed_length_mismatch_raises(params):
    with pytest.raises(ValueError, match="seeds/temps"):
        synthesize_mels(params, CFG, [_mel(8)], seed=[1, 2])


def test_bf16_upload_bit_identical(params):
    """The host-side bf16 pre-cast of mels/z (dispatch_mels) must be
    bit-identical to letting reverse() cast the fp32 upload on device:
    numpy/ml_dtypes and XLA both round fp32->bf16 to-nearest-even.
    Compares the dispatch path (pre-cast) against a direct reverse call
    fed the raw fp32 arrays under the same bf16 compute dtype."""
    from flowavenet_tpu.models.flowavenet import reverse

    mel = _mel(8)
    frames = 8
    hop = CFG.audio.hop_size
    seed = 7
    got = synthesize_mels(params, CFG, [mel], seed=[seed],
                          compute_dtype="bfloat16", bucket_frames=1)[0]
    z = (np.random.RandomState(seed).randn(frames * hop)
         * CFG.train.temp).astype(np.float32)[None, :, None]
    want = reverse(params, CFG.model, jnp.asarray(z),
                   jnp.asarray(mel)[None], compute_dtype=jnp.bfloat16)
    want = np.asarray(want[0, :, 0].astype(jnp.float32))
    np.testing.assert_array_equal(got, want)


def test_sharded_keep_rounds_to_shard_extent():
    """Pad-row trimming under a sharded batch axis must round the kept
    row count up to the PER-SHARD extent (rows per device), never the
    shard count — a finer slice would cut a shard mid-way and force the
    cross-device reshard the device-side trim exists to avoid."""
    from flowavenet_tpu.synthesis.synthesize import _sharded_keep

    # 8-row batch over 2 devices -> 4 rows/shard: 5 real rows keep 8
    assert _sharded_keep(5, 8, 4) == 8
    # over 4 devices -> 2 rows/shard: 5 real rows keep 6 (not 8)
    assert _sharded_keep(5, 8, 2) == 6
    # 1 row/shard degenerates to the exact count
    assert _sharded_keep(5, 8, 1) == 5
    # already aligned / full batch are identities
    assert _sharded_keep(4, 8, 4) == 4
    assert _sharded_keep(8, 8, 4) == 8


def test_materialize_wavs_sharded_batch(params):
    """End-to-end: a batch-sharded dispatch with pad rows materializes
    per-request audio identical to the unsharded path."""
    import jax.sharding as jsh

    from flowavenet_tpu.synthesis.synthesize import (dispatch_mels,
                                                     materialize_wavs)

    mels = [_mel(8, seed=i) for i in range(5)]
    devs = jax.devices()[:4]
    mesh = jsh.Mesh(np.array(devs), ("data",))
    sharding = jsh.NamedSharding(mesh, jsh.PartitionSpec("data"))
    wav, frames = dispatch_mels(params, CFG, mels, seed=list(range(5)),
                                pad_batch=True, data_sharding=sharding,
                                batch_multiple=len(devs))
    got = materialize_wavs(wav, frames, CFG)
    want = synthesize_mels(params, CFG, mels, seed=list(range(5)))
    assert len(got) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=2e-6, rtol=0)
