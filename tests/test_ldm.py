"""LDM path tests: VQ-VAE, latent dataset, end-to-end tiny LDM run,
backdoor-removal mode."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from villandiffusion_tpu.models.vae import (
    AutoencoderKLFlax,
    VQModelFlax,
    make_random_vq,
)


class TestVQModel:
    def test_encode_decode_shapes(self):
        vae = make_random_vq(
            block_out_channels=(8, 16, 16), layers_per_block=1,
            latent_channels=3, num_vq_embeddings=32,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        z = vae.encode(x)
        assert z.shape == (2, 8, 8, 3)  # 2 downsamples -> /4
        y = vae.decode(z)
        assert y.shape == (2, 32, 32, 3)
        assert bool(jnp.isfinite(y).all())

    def test_quantize_snaps_to_codebook(self):
        model = VQModelFlax(
            block_out_channels=(8, 16), layers_per_block=1,
            latent_channels=3, num_vq_embeddings=16,
        )
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 3))
        q = model.apply(params, z, method=model.quantize)
        codebook = np.asarray(params["params"]["codebook"])
        flat = np.asarray(q).reshape(-1, 3)
        for row in flat:
            assert np.min(np.linalg.norm(codebook - row, axis=1)) < 1e-6

    def test_autoencoder_kl(self):
        model = AutoencoderKLFlax(
            block_out_channels=(8, 16), layers_per_block=1, latent_channels=4
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        z_det = model.apply(params, x, method=model.encode)
        assert z_det.shape == (2, 8, 8, 4)
        z_samp = model.apply(
            params, x, jax.random.PRNGKey(2), method=model.encode
        )
        assert not np.allclose(z_det, z_samp)
        y = model.apply(params, z_det, method=model.decode)
        assert y.shape == (2, 16, 16, 3)


class TestLatentDataset:
    def test_build_and_load(self, tmp_path):
        from villandiffusion_tpu.data.latent import LatentDataset, build_latent_dataset

        vae = make_random_vq(
            block_out_channels=(8, 16), layers_per_block=1,
            latent_channels=3, num_vq_embeddings=16,
        )
        rng = np.random.default_rng(0)
        imgs = (rng.random((12, 16, 16, 3)) * 255).astype(np.uint8)
        root = str(tmp_path / "latents")
        build_latent_dataset(
            imgs, vae, root, trigger_types=["BOX_4"], target_types=["CORNER"],
            batch_size=4,
        )
        ds = LatentDataset(root).set_poison("BOX_4", "CORNER", poison_rate=0.5)
        assert len(ds) == 12
        batch = next(iter(ds.get_dataloader(batch_size=8)))
        assert batch["image"].shape == (8, 8, 8, 3)  # latent space /2
        pois = ~batch["is_clean"]
        assert batch["pixel_values"][~pois].sum() == 0 or pois.any()
        # poisoned targets equal the encoded target latent
        tgt = np.load(os.path.join(root, "target_CORNER.npy"))
        if pois.any():
            assert np.allclose(batch["target"][pois][0], tgt, atol=1e-6)


@pytest.mark.slow
class TestLDMEndToEnd:
    def test_tiny_ldm_train(self, tmp_path):
        from villandiffusion_tpu import cli

        res = str(tmp_path / "runs")
        cli.main(
            ["--mode", "train", "--dataset", "FAKE32",
             "--ckpt", "LDM-TINY-DEFAULT", "--sde_type", "SDE-LDM",
             "--trigger", "BOX_14", "--target", "CORNER",
             "--poison_rate", "0.5", "--epoch", "1", "--batch", "32",
             "--infer_steps", "4", "--eval_sample_n", "2",
             "--save_image_epochs", "1", "--save_model_epochs", "1",
             "--result", res, "--overwrite"]
        )
        (out,) = [d for d in os.listdir(res) if d.startswith("res_")]
        run = os.path.join(res, out)
        # samples are decoded back to 32px pixel space
        from PIL import Image

        img = Image.open(os.path.join(run, "samples", "final.png"))
        assert img.size[0] > 32  # grid of 2 images with padding


@pytest.mark.slow
class TestLatentCLI:
    """--dataset CELEBA-HQ-LATENT wired through the CLI: pre-encoded latents
    feed training directly (vae_encode=False), pixels ride along for
    FID/inpaint (reference: dataset.py:123-127,441-443, README.md:91)."""

    def test_latent_train_measure(self, tmp_path, monkeypatch):
        from villandiffusion_tpu import cli
        from villandiffusion_tpu import factory as F
        from villandiffusion_tpu.data.latent import build_latent_dataset

        # same factory ckpt the CLI will build -> identical (seeded) VQ params
        bundle = F.get_model_sched(
            image_size=32, channels=3, ckpt="LDM-TINY-DEFAULT",
            sde_type="SDE-LDM", noise_sched_type="UNIPC-SCHED",
        )
        rng = np.random.default_rng(0)
        imgs = (rng.random((24, 32, 32, 3)) * 255).astype(np.uint8)
        root = str(tmp_path / "latents")
        build_latent_dataset(
            imgs, bundle.vae, root,
            trigger_types=["BOX_14"], target_types=["HAT"], batch_size=8,
        )
        monkeypatch.setenv("VILLAN_LATENT_ROOT", root)

        res = str(tmp_path / "runs")
        scores = cli.main(
            ["--mode", "train+measure", "--dataset", "CELEBA-HQ-LATENT",
             "--ckpt", "LDM-TINY-DEFAULT", "--sde_type", "SDE-LDM",
             "--sched", "UNIPC-SCHED", "--trigger", "BOX_14", "--target", "HAT",
             "--poison_rate", "0.9", "--epoch", "1", "--batch", "8",
             "--infer_steps", "4", "--eval_sample_n", "2",
             "--eval_max_batch", "8", "--measure_sample_n", "8",
             "--save_image_epochs", "1", "--save_model_epochs", "1",
             "--result", res, "--overwrite"]
        )
        assert any(k.startswith("FID") for k in scores)
        assert any(k.startswith("MSE") for k in scores)
        (out,) = [d for d in os.listdir(res) if d.startswith("res_")]
        assert os.path.exists(os.path.join(res, out, "score.json"))
        # the run dir persists its own vqvae/ (reference save_pretrained
        # layout, VillanDiffusion.py:1109) so resume/sampling on the run
        # dir rebuild the pipeline without the factory ckpt
        run_dir = os.path.join(res, out)
        assert os.path.exists(os.path.join(run_dir, "vqvae", "params.msgpack"))
        cli.main(["--mode", "resume", "--ckpt", run_dir])

    def test_latent_loader_contract(self, tmp_path, monkeypatch):
        from villandiffusion_tpu.data import loader as L
        from villandiffusion_tpu.data.latent import build_latent_dataset

        vae = make_random_vq(
            block_out_channels=(8, 16), layers_per_block=1,
            latent_channels=3, num_vq_embeddings=16,
        )
        rng = np.random.default_rng(1)
        imgs = (rng.random((12, 16, 16, 3)) * 255).astype(np.uint8)
        root = str(tmp_path / "latents")
        build_latent_dataset(
            imgs, vae, root, trigger_types=["BOX_4"], target_types=["CORNER"],
            batch_size=4,
        )
        monkeypatch.setenv("VILLAN_LATENT_ROOT", root)
        dsl = L.DatasetLoader("CELEBA-HQ-LATENT", batch_size=4)
        dsl.set_poison("BOX_4", "CORNER", poison_rate=0.5).prepare_dataset()
        assert len(dsl) == 12
        assert dsl.image_size == 16 and dsl.channel == 3
        # pixel-space trigger/target for pipeline.encode at eval time
        assert dsl.trigger.shape == (16, 16, 3)
        batch = next(iter(dsl.get_dataloader()))
        assert batch[L.IMAGE].shape == (4, 8, 8, 3)  # latent space
        # pixel store rides along for FID / inpaint tails
        assert dsl.images.shape == (12, 16, 16, 3)
        tail = dsl.get_batch(np.arange(10, 12))
        assert tail[L.IMAGE].shape == (2, 16, 16, 3)
        assert tail[L.IMAGE].min() >= -1.0 and tail[L.IMAGE].max() <= 1.0


@pytest.mark.slow
class TestVAEPersistence:
    """save_vae_dir/load_vae_dir: the framework-native vqvae/ export that
    makes LDM run dirs self-contained (reference: pipeline.save_pretrained
    writes unet/ + vqvae/, VillanDiffusion.py:1109)."""

    def test_vq_roundtrip(self, tmp_path):
        from villandiffusion_tpu.models.vae import load_vae_dir, save_vae_dir

        vq = make_random_vq(sample_size=16, block_out_channels=(8, 16),
                            num_vq_embeddings=32)
        save_vae_dir(str(tmp_path), vq)
        rt = load_vae_dir(str(tmp_path / "vqvae"))
        assert type(rt.model).__name__ == "VQModelFlax"
        assert rt.model.block_out_channels == (8, 16)
        for a, b in zip(jax.tree.leaves(vq.params), jax.tree.leaves(rt.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        x = jnp.zeros((1, 16, 16, 3))
        np.testing.assert_array_equal(
            np.asarray(vq.encode(x)), np.asarray(rt.encode(x)))

    def test_kl_roundtrip_keeps_scaling_factor(self, tmp_path):
        from villandiffusion_tpu.models.vae import (
            VAEBundle, load_vae_dir, save_vae_dir)

        model = AutoencoderKLFlax(block_out_channels=(8, 16), latent_channels=4)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        kl = VAEBundle(model=model, params=params, scaling_factor=0.18215)
        save_vae_dir(str(tmp_path), kl)
        rt = load_vae_dir(str(tmp_path / "vqvae"))
        assert type(rt.model).__name__ == "AutoencoderKLFlax"
        assert rt.scaling_factor == pytest.approx(0.18215)

    def test_load_vae_for_prefers_run_dir(self, tmp_path, monkeypatch):
        from villandiffusion_tpu.models.vae import load_vae_for, save_vae_dir

        vq = make_random_vq(sample_size=16, block_out_channels=(8, 16),
                            num_vq_embeddings=32)
        run = tmp_path / "res_fake"
        run.mkdir()
        save_vae_dir(str(run), vq)
        rt = load_vae_for(str(run))
        assert rt.model.block_out_channels == (8, 16)
        with pytest.raises(FileNotFoundError):
            load_vae_for(str(tmp_path / "missing"))


class TestBackdoorRemoval:
    def test_rm_backdoor_trains_on_clean_images(self, tmp_path):
        from villandiffusion_tpu import cli

        res = str(tmp_path / "runs")
        cli.main(
            ["--mode", "train", "--dataset", "FAKE32",
             "--ckpt", "UNET-TINY-DEFAULT", "--rm_backdoor",
             "--trigger", "BOX_14", "--target", "CORNER",
             "--poison_rate", "0.5", "--epoch", "1", "--batch", "32",
             "--infer_steps", "4", "--eval_sample_n", "2",
             "--save_image_epochs", "1", "--save_model_epochs", "1",
             "--result", res, "--overwrite"]
        )
        (out,) = [d for d in os.listdir(res) if d.startswith("res_")]
        assert os.path.exists(os.path.join(res, out, "unet", "params.msgpack"))
