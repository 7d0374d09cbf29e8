"""Multi-chip sampling fan-out as a product path: pipelines built with a
mesh shard the init batch on the data axis (the reference's DataParallel
inference, /root/reference/VillanDiffusion.py:440) and must produce exactly
the unsharded results.  Runs on the 8-virtual-device CPU mesh (conftest)."""

import jax
import numpy as np
import pytest

from villandiffusion_tpu import factory as F
from villandiffusion_tpu.core import schedules as S
from villandiffusion_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def bundle():
    return F.get_model_sched(
        image_size=16, channels=3, ckpt="UNET-TINY-DEFAULT", sde_type=S.SDE_VP
    )


class TestShardedSampling:
    def test_sharded_equals_unsharded(self, bundle):
        init = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 3))
        rng = jax.random.PRNGKey(2)
        ref = bundle.make_pipeline()(init=init, num_inference_steps=4, rng=rng)
        shard = bundle.make_pipeline(mesh=make_mesh())(
            init=init, num_inference_steps=4, rng=rng
        )
        np.testing.assert_allclose(shard.images, ref.images, atol=2e-5)

    def test_padding_for_indivisible_batch(self, bundle):
        """Batches not divisible by the mesh size are cycled up to a
        shardable batch and sliced back: results stay exact, shape is the
        requested one."""
        assert len(jax.devices()) == 8
        init = jax.random.normal(jax.random.PRNGKey(3), (5, 16, 16, 3))
        rng = jax.random.PRNGKey(4)
        ref = bundle.make_pipeline()(init=init, num_inference_steps=3, rng=rng)
        shard = bundle.make_pipeline(mesh=make_mesh())(
            init=init, num_inference_steps=3, rng=rng
        )
        assert shard.images.shape == (5, 16, 16, 3)
        np.testing.assert_allclose(shard.images, ref.images, atol=2e-5)

    @pytest.mark.slow
    def test_movie_and_start_from_survive_sharding(self, bundle):
        """The inpaint contract (start_from + first-frame movie) through the
        sharded path."""
        init = jax.random.normal(jax.random.PRNGKey(5), (6, 16, 16, 3))
        rng = jax.random.PRNGKey(6)
        kw = dict(num_inference_steps=4, start_from=1, save_every_step=True,
                  movie_capture="first", rng=rng)
        ref = bundle.make_pipeline()(init=init, **kw)
        shard = bundle.make_pipeline(mesh=make_mesh())(init=init, **kw)
        np.testing.assert_allclose(shard.images, ref.images, atol=2e-5)
        assert len(shard.movie) == 1 and shard.movie[0].shape == (6, 16, 16, 3)
        np.testing.assert_allclose(shard.movie[0], ref.movie[0], atol=2e-5)

    @pytest.mark.slow
    def test_conditional_pipeline_sharded_equals_unsharded(self):
        """SD-style CFG pipeline: prompts (and their embeddings) are padded
        to a shardable batch and results match the unsharded run exactly —
        including the init=None path's noise draw."""
        from villandiffusion_tpu import cli_conditional as CC
        from villandiffusion_tpu.samplers.conditional import ConditionalPipeline

        args = CC.build_parser().parse_args([
            "--mode", "sampling", "--pretrained_model_name_or_path", "TINY",
            "--dataset_name", "FAKE-CAPTION", "--resolution", "16",
            "--caption_trigger", "TRIGGER_SKS", "--target", "CORNER",
            "--lora_r", "2", "--num_fake", "4", "--seed", "0",
        ])
        stack = CC.build_stack(args)

        def pipe_for(mesh):
            return ConditionalPipeline(
                unet_apply=stack.unet.apply, params=stack.params,
                vae=stack.vae, text_encode=stack.text.encode,
                tokenizer=stack.tokenizer, schedule=stack.schedule,
                sample_size=stack.latent_size,
                latent_channels=stack.unet.config.in_channels, mesh=mesh,
            )

        prompts = ["a cat", "a dog", "a bird"]  # 3 prompts on an 8-mesh
        rng = jax.random.PRNGKey(11)
        ref = pipe_for(None)(prompts, num_inference_steps=3, rng=rng)
        shard = pipe_for(make_mesh())(prompts, num_inference_steps=3, rng=rng)
        assert shard.images.shape == ref.images.shape
        np.testing.assert_allclose(shard.images, ref.images, atol=2e-5)

    def test_uint8_pipelined_fetch_path(self, bundle):
        """host=False + uint8 output (the measure loop's exact call shape)."""
        init = jax.random.normal(jax.random.PRNGKey(7), (8, 16, 16, 3))
        rng = jax.random.PRNGKey(8)
        ref = bundle.make_pipeline()(
            init=init, num_inference_steps=3, rng=rng, output_type="uint8"
        )
        out = bundle.make_pipeline(mesh=make_mesh())(
            init=init, num_inference_steps=3, rng=rng, output_type="uint8",
            host=False,
        )
        got = np.asarray(out.images)
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, ref.images)
