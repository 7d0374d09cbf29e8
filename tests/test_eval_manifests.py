"""Key+shape manifest tests for the pretrained-weight converters.

The environment has no network egress, so the real ``pt_inception-2015-12-05``
and torch-LPIPS(VGG) checkpoints cannot be downloaded.  These tests synthesize
state dicts with EXACTLY the key vocabulary and tensor shapes of the real
files (torchvision ``inception_v3(num_classes=1008, aux_logits=False)`` as
built by pytorch-fid's ``fid_inception_v3``; the ``lpips`` package's
``net.slice*``/``lin*`` layout) and assert:

  1. the converter consumes every weight key (none silently dropped),
  2. the converted tree matches ``jax.eval_shape`` of our Flax model
     leaf-for-leaf (structure AND shapes),

so the converters are de-risked against the real checkpoints' layouts even
though the weights themselves are absent (parity surface:
/root/reference/fid_score.py, /root/reference/VillanDiffusion.py:892).
"""

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.eval.inception import FIDInceptionV3, torch_inception_to_flax
from villandiffusion_tpu.eval.lpips import LPIPS, load_lpips_weights


# ---------------------------------------------------------------------------
# pt_inception-2015-12-05 manifest: (module -> conv weight OIHW shape)
# ---------------------------------------------------------------------------

def _convbn_modules():
    mods = {
        "Conv2d_1a_3x3": (32, 3, 3, 3),
        "Conv2d_2a_3x3": (32, 32, 3, 3),
        "Conv2d_2b_3x3": (64, 32, 3, 3),
        "Conv2d_3b_1x1": (80, 64, 1, 1),
        "Conv2d_4a_3x3": (192, 80, 3, 3),
    }

    def inception_a(blk, cin, pool):
        mods.update({
            f"{blk}.branch1x1": (64, cin, 1, 1),
            f"{blk}.branch5x5_1": (48, cin, 1, 1),
            f"{blk}.branch5x5_2": (64, 48, 5, 5),
            f"{blk}.branch3x3dbl_1": (64, cin, 1, 1),
            f"{blk}.branch3x3dbl_2": (96, 64, 3, 3),
            f"{blk}.branch3x3dbl_3": (96, 96, 3, 3),
            f"{blk}.branch_pool": (pool, cin, 1, 1),
        })
        return 64 + 64 + 96 + pool

    c = inception_a("Mixed_5b", 192, 32)        # 256
    c = inception_a("Mixed_5c", c, 64)          # 288
    c = inception_a("Mixed_5d", c, 64)          # 288

    mods.update({                               # InceptionB
        "Mixed_6a.branch3x3": (384, c, 3, 3),
        "Mixed_6a.branch3x3dbl_1": (64, c, 1, 1),
        "Mixed_6a.branch3x3dbl_2": (96, 64, 3, 3),
        "Mixed_6a.branch3x3dbl_3": (96, 96, 3, 3),
    })
    c = 384 + 96 + c                            # 768

    def inception_c(blk, c7):
        mods.update({
            f"{blk}.branch1x1": (192, c, 1, 1),
            f"{blk}.branch7x7_1": (c7, c, 1, 1),
            f"{blk}.branch7x7_2": (c7, c7, 1, 7),
            f"{blk}.branch7x7_3": (192, c7, 7, 1),
            f"{blk}.branch7x7dbl_1": (c7, c, 1, 1),
            f"{blk}.branch7x7dbl_2": (c7, c7, 7, 1),
            f"{blk}.branch7x7dbl_3": (c7, c7, 1, 7),
            f"{blk}.branch7x7dbl_4": (c7, c7, 7, 1),
            f"{blk}.branch7x7dbl_5": (192, c7, 1, 7),
            f"{blk}.branch_pool": (192, c, 1, 1),
        })

    inception_c("Mixed_6b", 128)
    inception_c("Mixed_6c", 160)
    inception_c("Mixed_6d", 160)
    inception_c("Mixed_6e", 192)

    mods.update({                               # InceptionD
        "Mixed_7a.branch3x3_1": (192, 768, 1, 1),
        "Mixed_7a.branch3x3_2": (320, 192, 3, 3),
        "Mixed_7a.branch7x7x3_1": (192, 768, 1, 1),
        "Mixed_7a.branch7x7x3_2": (192, 192, 1, 7),
        "Mixed_7a.branch7x7x3_3": (192, 192, 7, 1),
        "Mixed_7a.branch7x7x3_4": (192, 192, 3, 3),
    })

    def inception_e(blk, cin):
        mods.update({
            f"{blk}.branch1x1": (320, cin, 1, 1),
            f"{blk}.branch3x3_1": (384, cin, 1, 1),
            f"{blk}.branch3x3_2a": (384, 384, 1, 3),
            f"{blk}.branch3x3_2b": (384, 384, 3, 1),
            f"{blk}.branch3x3dbl_1": (448, cin, 1, 1),
            f"{blk}.branch3x3dbl_2": (384, 448, 3, 3),
            f"{blk}.branch3x3dbl_3a": (384, 384, 1, 3),
            f"{blk}.branch3x3dbl_3b": (384, 384, 3, 1),
            f"{blk}.branch_pool": (192, cin, 1, 1),
        })

    inception_e("Mixed_7b", 1280)
    inception_e("Mixed_7c", 2048)
    return mods


def _pt_inception_state_dict(seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    for mod, (o, i, kh, kw) in _convbn_modules().items():
        sd[f"{mod}.conv.weight"] = rng.normal(0, 0.05, (o, i, kh, kw)).astype(np.float32)
        sd[f"{mod}.bn.weight"] = rng.uniform(0.5, 1.5, (o,)).astype(np.float32)
        sd[f"{mod}.bn.bias"] = rng.normal(0, 0.1, (o,)).astype(np.float32)
        sd[f"{mod}.bn.running_mean"] = rng.normal(0, 0.1, (o,)).astype(np.float32)
        sd[f"{mod}.bn.running_var"] = rng.uniform(0.5, 1.5, (o,)).astype(np.float32)
        sd[f"{mod}.bn.num_batches_tracked"] = np.asarray(0, np.int64)
    # 1008-way TF-classes fc head (unused by pool3 FID features)
    sd["fc.weight"] = rng.normal(0, 0.01, (1008, 2048)).astype(np.float32)
    sd["fc.bias"] = np.zeros((1008,), np.float32)
    return sd


class TestInceptionManifest:
    def test_converter_covers_manifest_and_matches_model(self):
        sd = _pt_inception_state_dict()
        params = torch_inception_to_flax(sd)

        # every weight key either consumed by the converter (convbn reads
        # exactly these 5 suffixes) or explicitly irrelevant to pool3 FID
        consumed_suffixes = (
            ".conv.weight", ".bn.weight", ".bn.bias",
            ".bn.running_mean", ".bn.running_var",
        )
        ignorable = {"fc.weight", "fc.bias"}
        for k in sd:
            if k in ignorable or k.endswith(".num_batches_tracked"):
                continue
            assert k.endswith(consumed_suffixes), f"unconsumed key {k}"
            mod = k.rsplit(".", 2)[0]
            assert mod in _convbn_modules(), f"module {mod} unknown to converter"

        # structure + shapes must equal the Flax model's own init tree
        model = FIDInceptionV3()
        spec = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
        )
        flat_spec = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(spec)[0]
        }
        flat_conv = {
            jax.tree_util.keystr(p): np.asarray(v).shape
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        assert set(flat_spec) == set(flat_conv), (
            sorted(set(flat_spec) ^ set(flat_conv))[:8]
        )
        for k in flat_spec:
            assert flat_spec[k] == flat_conv[k], (k, flat_spec[k], flat_conv[k])

    def test_converted_params_run_and_bn_folds(self):
        sd = _pt_inception_state_dict()
        params = torch_inception_to_flax(sd)
        model = FIDInceptionV3()
        x = np.random.default_rng(1).uniform(0, 1, (2, 299, 299, 3)).astype(np.float32)
        acts = jax.jit(model.apply)(params, jnp.asarray(x))
        assert acts.shape == (2, 2048)
        assert np.all(np.isfinite(np.asarray(acts)))


# ---------------------------------------------------------------------------
# torch-LPIPS (vgg) manifest: net.slice{1..5}.<torchvision feature idx> convs
# + lin{0..4}.model.1 heads
# ---------------------------------------------------------------------------

_LPIPS_CONVS = [
    # (key, (out, in)) — all 3x3; indices are torchvision vgg16.features ids
    ("net.slice1.0", (64, 3)), ("net.slice1.2", (64, 64)),
    ("net.slice2.5", (128, 64)), ("net.slice2.7", (128, 128)),
    ("net.slice3.10", (256, 128)), ("net.slice3.12", (256, 256)),
    ("net.slice3.14", (256, 256)),
    ("net.slice4.17", (512, 256)), ("net.slice4.19", (512, 512)),
    ("net.slice4.21", (512, 512)),
    ("net.slice5.24", (512, 512)), ("net.slice5.26", (512, 512)),
    ("net.slice5.28", (512, 512)),
]
_LPIPS_HEADS = [64, 128, 256, 512, 512]


def _lpips_state_dict(tmp_path, seed=0):
    import torch

    rng = np.random.default_rng(seed)
    sd = {}
    for key, (o, i) in _LPIPS_CONVS:
        sd[key + ".weight"] = torch.from_numpy(
            rng.normal(0, 0.05, (o, i, 3, 3)).astype(np.float32)
        )
        sd[key + ".bias"] = torch.from_numpy(
            rng.normal(0, 0.1, (o,)).astype(np.float32)
        )
    for n, c in enumerate(_LPIPS_HEADS):
        sd[f"lin{n}.model.1.weight"] = torch.from_numpy(
            rng.uniform(0, 0.1, (1, c, 1, 1)).astype(np.float32)
        )
    path = str(tmp_path / "lpips_vgg.pth")
    torch.save(sd, path)
    return path


class TestLPIPSManifest:
    def test_converter_matches_model_and_runs(self, tmp_path):
        path = _lpips_state_dict(tmp_path)
        params = load_lpips_weights(path)

        model = LPIPS()
        spec = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
        )
        flat_spec = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(spec)[0]
        }
        flat_conv = {
            jax.tree_util.keystr(p): np.asarray(v).shape
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        assert set(flat_spec) == set(flat_conv), (
            sorted(set(flat_spec) ^ set(flat_conv))[:8]
        )
        for k in flat_spec:
            assert flat_spec[k] == flat_conv[k], (k, flat_spec[k], flat_conv[k])

        a = np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
        b = np.random.default_rng(2).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
        d_ab = np.asarray(jax.jit(model.apply)(params, jnp.asarray(a), jnp.asarray(b)))
        d_aa = np.asarray(jax.jit(model.apply)(params, jnp.asarray(a), jnp.asarray(a)))
        assert d_ab.shape == (2,)
        assert np.all(d_ab > d_aa)  # identical pair scores strictly lower
        assert np.allclose(d_aa, 0.0, atol=1e-6)

    def test_conv_order_preserved(self, tmp_path):
        """The slice/index sort must reconstruct conv_0..conv_12 in VGG order
        (slice10 sorting lexically before slice2 would scramble layers)."""
        path = _lpips_state_dict(tmp_path)
        params = load_lpips_weights(path)
        vgg = params["params"]["vgg"]
        for conv_i, (key, (o, i)) in enumerate(_LPIPS_CONVS):
            assert vgg[f"conv_{conv_i}"]["kernel"].shape == (3, 3, i, o), key
