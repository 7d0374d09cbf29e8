"""Conditional (SD+LoRA) path tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from villandiffusion_tpu.data import caption_loader as CL
from villandiffusion_tpu.models.text import make_tiny_text_encoder
from villandiffusion_tpu.models.unet2d_condition import (
    UNet2DCondition,
    UNet2DConditionConfig,
    lora_mask,
    split_lora_params,
    merge_lora_params,
)


class TestCaptionBackdoor:
    def test_trigger_table(self):
        assert CL.CaptionBackdoor.get_trigger("TRIGGER_SKS") == "sks"
        assert CL.CaptionBackdoor.get_trigger("TRIGGER_LATTE_COFFEE") == "latte coffee"
        assert CL.CaptionBackdoor.get_trigger("TRIGGER_NONE") == ""
        assert CL.CaptionBackdoor.get_trigger(None) == ""
        with pytest.raises(NotImplementedError):
            CL.CaptionBackdoor.get_trigger("TRIGGER_NOPE")

    def test_insert_trigger_at_end_region(self):
        import random

        txt = "a b c d e"
        out = CL.CaptionBackdoor.insert_trigger(
            txt, "sks", -3, -1, random.Random(0)
        )
        words = out.split()
        assert "sks" in words and len(words) == 6
        assert words.index("sks") >= 3  # inserted within the last 2 slots

    def test_generator_list(self):
        gen = CL.CaptionBackdoor.backdoor_caption_generator("TRIGGER_SKS", 0, -1, seed=1)
        outs = gen(["hello world", "foo bar baz"])
        assert all("sks" in o for o in outs)


class TestCaptionDataset:
    def test_batch_contract(self):
        dsl = CL.CaptionDatasetLoader(
            CL.FAKE_CAPTION, image_size=16, num_fake=16, batch_size=4
        ).set_poison(
            image_trigger="BOX_4",
            caption_trigger="TRIGGER_SKS",
            target="CORNER",
            poison_rate=0.5,
        )
        batch = next(iter(dsl.get_dataloader(batch_size=8)))
        for key in (CL.RAW, CL.IMAGE, CL.POISON_IMAGE):
            assert batch[key].shape == (8, 16, 16, 3)
        assert len(batch[CL.CAPTION]) == 8
        pois = batch["is_poison"]
        # poisoned rows: caption carries the trigger, image is the target
        for c, p in zip(batch[CL.CAPTION], pois):
            assert ("sks" in c.split()) == bool(p)
        if pois.any():
            tgt = np.broadcast_to(dsl.target, batch[CL.IMAGE].shape)
            assert np.allclose(batch[CL.IMAGE][pois], tgt[pois])
        if (~pois).any():
            assert np.allclose(batch[CL.IMAGE][~pois], batch[CL.RAW][~pois])
            assert np.all(batch[CL.POISON_IMAGE][~pois] == 0)

    def test_tokenizing_collate(self):
        tok = CL.HashTokenizer(vocab_size=128)
        collate = CL.collate_fn_backdoor_gen(tok)
        dsl = CL.CaptionDatasetLoader(
            CL.FAKE_CAPTION, image_size=16, num_fake=8
        ).set_poison(caption_trigger="TRIGGER_SKS", target="CORNER", poison_rate=1.0)
        batch = collate(next(iter(dsl.get_dataloader(batch_size=4))))
        assert batch[CL.CAPTION].shape == (4, 77)
        assert batch[CL.CAPTION].dtype == np.int32
        # determinism
        a = tok("hello world")["input_ids"]
        b = tok("hello world")["input_ids"]
        assert np.array_equal(a, b)


@pytest.fixture(scope="module")
def tiny_cond():
    model = UNet2DCondition(UNet2DConditionConfig.tiny(lora_rank=4))
    params = model.init_params(jax.random.PRNGKey(0), text_len=77)
    return model, params


class TestUNetCondition:
    def test_forward(self, tiny_cond):
        model, params = tiny_cond
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 32))
        y = jax.jit(model.apply)(params, x, jnp.array([1, 500]), ctx)
        assert y.shape == (2, 8, 8, 4)
        assert bool(jnp.isfinite(y).all())

    def test_text_conditioning_matters(self, tiny_cond):
        model, params = tiny_cond
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
        f = jax.jit(model.apply)
        y1 = f(params, x, jnp.array([5]), jnp.zeros((1, 77, 32)))
        y2 = f(params, x, jnp.array([5]), jnp.ones((1, 77, 32)))
        assert not np.allclose(y1, y2)

    def test_lora_zero_init_is_identity(self):
        """With lora_up zero-init, rank>0 output == rank=0 output for
        identical base params."""
        m_lora = UNet2DCondition(UNet2DConditionConfig.tiny(lora_rank=4))
        p_lora = m_lora.init_params(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 32))
        y = m_lora.apply(p_lora, x, jnp.array([3]), ctx)
        # zero the lora_up params explicitly (they are zero-init anyway) and
        # perturb lora_down: output must be unchanged (up is zero)
        import jax.tree_util as jtu

        def bump_down(path, leaf):
            keys = tuple(k.key if isinstance(k, jtu.DictKey) else "" for k in path)
            return leaf + 1.0 if "lora_down" in keys else leaf

        p2 = jtu.tree_map_with_path(bump_down, p_lora)
        y2 = m_lora.apply(p2, x, jnp.array([3]), ctx)
        assert np.allclose(y, y2)

    def test_lora_mask_and_split(self, tiny_cond):
        model, params = tiny_cond
        mask = lora_mask(params)
        n_lora = sum(bool(m) for m in jax.tree.leaves(mask))
        assert n_lora > 0
        flat = split_lora_params(params)
        assert len(flat) == n_lora
        assert all("lora" in k for k in flat)
        # roundtrip merge
        bumped = {k: v + 1.0 for k, v in flat.items()}
        merged = merge_lora_params(params, bumped)
        flat2 = split_lora_params(merged)
        for k in flat:
            assert np.allclose(flat2[k], flat[k] + 1.0)

    def test_full_param_split_roundtrip(self, tiny_cond):
        """split_all_params covers EVERY leaf and merges back losslessly
        (the --full_finetune checkpoint format)."""
        from villandiffusion_tpu.models.unet2d_condition import split_all_params

        model, params = tiny_cond
        flat = split_all_params(params)
        assert len(flat) == len(jax.tree.leaves(params))
        assert len(flat) > len(split_lora_params(params))
        zeroed = jax.tree.map(jnp.zeros_like, params)
        merged = merge_lora_params(zeroed, flat)
        for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(params)):
            assert np.allclose(np.asarray(a), np.asarray(b))

    def test_cross_rank_merge_keeps_fresh_lora(self, tiny_cond):
        """A full-param export saved at rank 4 initializes a rank-16 model:
        backbone leaves transfer exactly, shape-mismatched LoRA leaves are
        skipped so the new model keeps its own fresh LoRA (the r5
        cross-rank backbone-init path, tools/parity_cond_lora.py --lora_r)."""
        from villandiffusion_tpu.models.unet2d_condition import split_all_params

        m4, p4 = tiny_cond
        flat = split_all_params(p4)
        m16 = UNet2DCondition(UNet2DConditionConfig.tiny(lora_rank=16))
        p16 = m16.init_params(jax.random.PRNGKey(3), text_len=77)
        merged = merge_lora_params(p16, flat)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 32))
        y16 = m16.apply(merged, x, jnp.array([3]), ctx)
        assert bool(jnp.isfinite(y16).all())
        # both ranks carry zero-init lora_up (identity delta) and the
        # backbone transferred exactly, so the functions must agree
        y4 = m4.apply(p4, x, jnp.array([3]), ctx)
        assert np.allclose(np.asarray(y4), np.asarray(y16), atol=1e-5)


class TestConditionalTraining:
    @pytest.mark.slow
    def test_lora_only_updates_and_loss_decreases(self):
        from villandiffusion_tpu.models.vae import AutoencoderKLFlax
        from villandiffusion_tpu.parallel import make_mesh, shard_batch
        from villandiffusion_tpu.train import conditional as CT

        mesh = make_mesh(n_devices=1)
        model = UNet2DCondition(UNet2DConditionConfig.tiny(lora_rank=2))
        params = model.init_params(jax.random.PRNGKey(0))
        text = make_tiny_text_encoder(hidden_size=32)
        vae = AutoencoderKLFlax(
            block_out_channels=(8, 16), layers_per_block=1, latent_channels=4
        )
        vae_params = jax.jit(vae.init)(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))

        def vae_encode(fr, x, rng):
            z = vae.apply(fr["vae"], x, method=vae.encode)
            return z * CT.SD_SCALING

        sched = CT.sd_schedule(100)
        loss = CT.CondBackdoorLoss(
            schedule=sched, vae_encode=vae_encode,
            text_encode=lambda fr, ids: text.encode_with(fr["text"], ids),
        )
        trainer = CT.ConditionalTrainer(
            unet_apply=model.apply,
            loss=loss,
            terms=CT.caption_backdoor_terms(prior_loss_weight=1.0),
            optimizer=CT.make_lora_optimizer(params, 1e-2, warmup_steps=1, total_steps=50),
            mesh=mesh,
            frozen={"vae": vae_params, "text": text.params},
        )
        state = trainer.init_state(params)
        step = trainer.make_step()

        tok = CL.HashTokenizer(vocab_size=1024)
        collate = CL.collate_fn_backdoor_gen(tok)
        dsl = CL.CaptionDatasetLoader(
            CL.FAKE_CAPTION, image_size=16, num_fake=8
        ).set_poison(caption_trigger="TRIGGER_SKS", target="CORNER", poison_rate=0.5)
        raw = collate(next(iter(dsl.get_dataloader(batch_size=4))))
        batch = {
            k: jnp.asarray(raw[k])
            for k in (CL.RAW, CL.IMAGE, CL.POISON_IMAGE, CL.CAPTION, CL.RAW_CAPTION)
        }

        base_before = np.asarray(
            state.params["params"]["conv_in"]["kernel"]
        ).copy()
        lora_before = split_lora_params(state.params)
        losses = []
        for i in range(8):
            state, l = step(state, batch, jax.random.PRNGKey(0))
            losses.append(float(l))
        assert all(np.isfinite(losses))
        # base params frozen, lora params moved
        base_after = np.asarray(state.params["params"]["conv_in"]["kernel"])
        assert np.allclose(base_before, base_after)
        lora_after = split_lora_params(state.params)
        moved = any(
            not np.allclose(lora_before[k], lora_after[k]) for k in lora_before
        )
        assert moved
        assert np.mean(losses[-2:]) < np.mean(losses[:2])


class TestSplitTermStep:
    @pytest.mark.slow
    def test_split_step_matches_monolithic(self):
        """make_split_step (one jitted graph per loss term + grad-accum
        apply) must reproduce make_step's updates: grads are linear in the
        loss sum and the per-term rng streams are identical."""
        from villandiffusion_tpu.models.vae import AutoencoderKLFlax
        from villandiffusion_tpu.parallel import make_mesh
        from villandiffusion_tpu.train import conditional as CT

        mesh = make_mesh(n_devices=1)
        model = UNet2DCondition(UNet2DConditionConfig.tiny(lora_rank=2))
        params = model.init_params(jax.random.PRNGKey(0))
        text = make_tiny_text_encoder(hidden_size=32)
        vae = AutoencoderKLFlax(
            block_out_channels=(8, 16), layers_per_block=1, latent_channels=4
        )
        vae_params = jax.jit(vae.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3))
        )

        def vae_encode(fr, x, rng):
            return vae.apply(fr["vae"], x, method=vae.encode) * CT.SD_SCALING

        loss = CT.CondBackdoorLoss(
            schedule=CT.sd_schedule(100), vae_encode=vae_encode,
            text_encode=lambda fr, ids: text.encode_with(fr["text"], ids),
        )
        # 3 terms: backdoor + prior (the canonical SD-512 pair) + an extra
        # weighted image term so the accumulation loop runs more than once
        terms = CT.image_backdoor_terms(prior_loss_weight=0.7)
        trainer = CT.ConditionalTrainer(
            unet_apply=model.apply, loss=loss, terms=terms,
            optimizer=CT.make_lora_optimizer(
                params, 1e-2, warmup_steps=1, total_steps=50
            ),
            mesh=mesh,
            frozen={"vae": vae_params, "text": text.params},
        )
        tok = CL.HashTokenizer(vocab_size=1024)
        collate = CL.collate_fn_backdoor_gen(tok)
        dsl = CL.CaptionDatasetLoader(
            CL.FAKE_CAPTION, image_size=16, num_fake=8
        ).set_poison(
            caption_trigger="TRIGGER_SKS", target="CORNER", poison_rate=0.5
        )
        raw = collate(next(iter(dsl.get_dataloader(batch_size=4))))
        batch = {
            k: jnp.asarray(raw[k])
            for k in (CL.RAW, CL.IMAGE, CL.POISON_IMAGE, CL.CAPTION,
                      CL.RAW_CAPTION)
        }
        rng = jax.random.PRNGKey(7)

        mono_state = trainer.init_state(params)
        split_state = trainer.init_state(params)
        mono, split = trainer.make_step(), trainer.make_split_step()
        for _ in range(3):
            mono_state, ml = mono(mono_state, batch, rng)
            split_state, sl = split(split_state, batch, rng)
            assert float(ml) == pytest.approx(float(sl), rel=1e-5)
        for a, b in zip(
            jax.tree.leaves(mono_state.params),
            jax.tree.leaves(split_state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
            )


@pytest.mark.slow
def test_conditional_fsdp_matches_dp():
    """param_sharding='fsdp' (params + Adam moments sharded over the data
    axis) must reproduce plain-DP numerics for BOTH step flavors, with at
    least one param leaf actually sharded."""
    from villandiffusion_tpu.models.vae import AutoencoderKLFlax
    from villandiffusion_tpu.models.text import make_tiny_text_encoder
    from villandiffusion_tpu.parallel import make_mesh
    from villandiffusion_tpu.train import conditional as CT

    mesh = make_mesh()
    model = UNet2DCondition(UNet2DConditionConfig.tiny(lora_rank=2))
    params = model.init_params(jax.random.PRNGKey(0))
    text = make_tiny_text_encoder(hidden_size=32)
    vae = AutoencoderKLFlax(
        block_out_channels=(8, 16), layers_per_block=1, latent_channels=4
    )
    vae_params = jax.jit(vae.init)(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
    loss = CT.CondBackdoorLoss(
        schedule=CT.sd_schedule(100),
        vae_encode=lambda fr, x, rng: vae.apply(
            fr["vae"], x, method=vae.encode
        ) * CT.SD_SCALING,
        text_encode=lambda fr, ids: text.encode_with(fr["text"], ids),
    )

    def trainer_for(sharding):
        return CT.ConditionalTrainer(
            unet_apply=model.apply, loss=loss,
            terms=CT.caption_backdoor_terms(1.0),
            optimizer=CT.make_lora_optimizer(
                params, 1e-2, warmup_steps=1, total_steps=50
            ),
            mesh=mesh, frozen={"vae": vae_params, "text": text.params},
            param_sharding=sharding, fsdp_min_size=0,
        )

    tok = CL.HashTokenizer(vocab_size=1024)
    collate = CL.collate_fn_backdoor_gen(tok)
    dsl = CL.CaptionDatasetLoader(
        CL.FAKE_CAPTION, image_size=16, num_fake=8
    ).set_poison(caption_trigger="TRIGGER_SKS", target="CORNER", poison_rate=0.5)
    raw = collate(next(iter(dsl.get_dataloader(batch_size=8))))
    batch = {
        k: jnp.asarray(raw[k])
        for k in (CL.RAW, CL.IMAGE, CL.CAPTION, CL.RAW_CAPTION)
    }
    rng = jax.random.PRNGKey(3)

    finals = {}
    for sharding in ("replicated", "fsdp"):
        for flavor in ("mono", "split"):
            tr = trainer_for(sharding)
            st = tr.init_state(params)
            if sharding == "fsdp" and flavor == "mono":
                assert any(
                    any(ax is not None for ax in leaf.sharding.spec)
                    for leaf in jax.tree.leaves(st.params)
                ), "no param leaf actually FSDP-sharded"
            step = tr.make_step() if flavor == "mono" else tr.make_split_step()
            for _ in range(2):
                st, loss_v = step(st, batch, rng)
            finals[(sharding, flavor)] = (
                float(loss_v), jax.device_get(st.params)
            )
    ref_loss, ref_params = finals[("replicated", "mono")]
    # Tolerances sized for XLA-CPU run-to-run wobble: under host contention
    # the threaded contraction order shifts reductions past 2e-5 (observed
    # one flake at rtol 2e-5 on a fully loaded core).  A real sharding bug
    # produces O(1) relative errors, not 1e-4.
    for key, (lv, ps) in finals.items():
        assert lv == pytest.approx(ref_loss, rel=5e-5), key
        for a, b in zip(jax.tree.leaves(ps), jax.tree.leaves(ref_params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=str(key),
            )


def test_frozen_params_are_arguments_not_hlo_constants():
    """Regression guard for the compile-payload fix: the train step must
    receive frozen VAE/text params as jit ARGUMENTS.  Closing over them
    inlines the weights into the program as literal constants — for the
    real SD stack that is ~0.5 GB of HLO (the remote-compile 413s) — so the
    lowered text with frozen-as-args must be dramatically smaller than the
    closed-over variant of the same loss."""
    from villandiffusion_tpu.models.text import make_tiny_text_encoder
    from villandiffusion_tpu.models.vae import AutoencoderKLFlax
    from villandiffusion_tpu.train import conditional as CT

    model = UNet2DCondition(UNet2DConditionConfig.tiny(lora_rank=2))
    params = model.init_params(jax.random.PRNGKey(0))
    text = make_tiny_text_encoder(hidden_size=32)
    vae = AutoencoderKLFlax(
        block_out_channels=(8, 16), layers_per_block=1, latent_channels=4
    )
    vae_params = jax.jit(vae.init)(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
    frozen = {"vae": vae_params, "text": text.params}
    loss = CT.CondBackdoorLoss(
        schedule=CT.sd_schedule(100),
        vae_encode=lambda fr, x, rng: vae.apply(
            fr["vae"], x, method=vae.encode
        ) * CT.SD_SCALING,
        text_encode=lambda fr, ids: text.encode_with(fr["text"], ids),
    )
    term = CT.LossTerm("x", "ids", 1.0)
    mini = {"x": jnp.zeros((2, 16, 16, 3)), "ids": jnp.zeros((2, 77), jnp.int32)}
    rng = jax.random.PRNGKey(0)

    as_args = jax.jit(
        lambda p, fr: loss.term_loss(model.apply, p, mini, term, rng, fr)
    ).lower(params, frozen).as_text()
    closed = jax.jit(
        lambda p: loss.term_loss(model.apply, p, mini, term, rng, frozen)
    ).lower(params).as_text()
    # tiny stack: ~49408x32 embedding table alone dominates the closed-over
    # variant; the args variant must be at least 5x smaller
    assert len(as_args) * 5 < len(closed), (len(as_args), len(closed))


def test_published_caption_similarity_table():
    """The reference's published constants (measure.py:14-45) are vendored
    verbatim and keyed by (in-dist dataset, trigger)."""
    from villandiffusion_tpu.eval.conditional_measure import (
        CAPTION_SIMILARITY,
        published_caption_similarity,
    )

    assert published_caption_similarity(
        "POKEMON-CAPTION", "TRIGGER_LATTE_COFFEE"
    ) == 0.784
    assert published_caption_similarity("CELEBA-HQ-DIALOG", "TRIGGER_SKS") == 0.922
    assert published_caption_similarity("FAKE-CAPTION", "TRIGGER_SKS") is None
    for ds, table in CAPTION_SIMILARITY.items():
        assert len(table) == 13 and table["TRIGGER_NONE"] == 1.0, ds


def test_caption_augment_collate_and_terms():
    from villandiffusion_tpu.data import caption_loader as CL
    from villandiffusion_tpu.train import conditional as CT

    tok = CL.HashTokenizer()
    collate = CL.collate_fn_backdoor_gen(tok, caption_augment=2)
    batch = {
        CL.CAPTION: ["a cat", "a dog", "a bird", "a fish"],
        CL.RAW_CAPTION: ["a cat", "a dog", "a bird", "a fish"],
    }
    out = collate(batch)
    assert CL.caption_augment_key(0) in out and CL.caption_augment_key(1) in out
    assert out[CL.caption_augment_key(0)].shape == out[CL.CAPTION].shape
    # aug_0 = captions shifted by 0*gap, aug_1 shifted by gap=2
    np.testing.assert_array_equal(out[CL.caption_augment_key(0)], out[CL.CAPTION])
    assert not np.array_equal(out[CL.caption_augment_key(1)], out[CL.CAPTION])

    terms = CT.caption_augment_terms(2, weight=0.5)
    assert [t.caption_key for t in terms] == ["caption_aug_0", "caption_aug_1"]
    assert all(t.weight == 0.5 and t.poison_key is None for t in terms)
