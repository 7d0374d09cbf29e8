"""Sampler/pipeline infrastructure: every solver is a `lax.scan` step.

Contract parity with the reference's forked-diffusers pipelines
(SURVEY.md §2.9; call sites /root/reference/VillanDiffusion.py:579-581,
620-636, model.py:482-487,517-521):

- ``pipeline(batch_size=, num_inference_steps=, init=, start_from=,
  save_every_step=, eta=, output_type=None, rng=)``
- ``init``: initial latent (enables trigger-shifted noise `noise + encode(R)`)
- ``start_from``: begin the denoise loop at step index k (inpainting tasks)
- ``save_every_step``: capture the trajectory; exposed as ``.movie``
- ``output_type=None``: numpy float NHWC in [0, 1]; ``"uint8"``: quantized
  on-device; ``"latent"``: raw model-space output, no VAE decode
- ``pipeline.encode(x)``: pixel->model space (identity for pixel models,
  VAE encode for latent models)

TPU-first: the full denoise loop is ONE jitted scan per (shape, steps)
combination — no per-step Python dispatch, no host sync until the final
device->host copy.  Samplers own their model evaluations inside the scan
body (multi-eval solvers: Heun, PNDM's Runge-Kutta warmup, predictor-
corrector VE), so any solver order fits the same compiled structure.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Sampler:
    """Interface: timestep ladder + conditioning + the scan-step update."""

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending array of model timesteps; its length is the number of
        scan iterations (may exceed num_inference_steps for multi-phase
        solvers)."""
        raise NotImplementedError

    def cond(self, i: jnp.ndarray, batch: int, num_inference_steps: int) -> jnp.ndarray:
        """Model conditioning for scan index i: (B,) timesteps for VP models,
        (B,) sigmas for VE models."""
        ts = jnp.asarray(self.timesteps(num_inference_steps))
        return jnp.broadcast_to(ts[i], (batch,))

    def init_latent_scale(self) -> float:
        """Multiplier on the unit-gaussian initial latent (sigma_max for VE)."""
        return 1.0

    def init_carry(self, x: jnp.ndarray, num_inference_steps: int) -> Any:
        """Solver state threaded through the scan (history buffers etc.)."""
        return ()

    def step(
        self,
        x: jnp.ndarray,
        i: jnp.ndarray,
        carry: Any,
        rng: jax.Array,
        eval_model: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        num_inference_steps: int,
    ) -> Tuple[jnp.ndarray, Any]:
        """One scan iteration. ``eval_model(x, i)`` runs the UNet with the
        conditioning for scan index i."""
        raise NotImplementedError


@dataclasses.dataclass
class SamplerOutput:
    images: np.ndarray
    movie: Optional[list] = None


class DiffusionPipeline:
    """Runs the jitted denoise scan and maps model space -> [0,1] images."""

    def __init__(
        self,
        apply_fn: Callable,          # (params, x, cond) -> eps/score
        params,
        sampler: Sampler,
        sample_size: int,
        channels: int,
        vae=None,                    # optional object with encode/decode
        output_map: str = "vp",      # "vp": x/2+0.5 ; "ve": clip(x, 0, 1)
        mesh=None,                   # jax.sharding.Mesh: fan sampling out
    ):
        self.apply_fn = apply_fn
        self.params = params
        self.sampler = sampler
        self.sample_size = sample_size
        self.channels = channels
        self.vae = vae
        self.output_map = output_map
        # data-parallel sampling fan-out (the reference's DataParallel
        # inference, /root/reference/VillanDiffusion.py:440): batch sharded
        # on the mesh's data axis, params replicated, XLA runs the denoise
        # scan SPMD — no collectives in the loop, pure fan-out over ICI
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self._params_placed = False

    # --- reference surface: .unet.in_channels / .sample_size --------------
    @property
    def in_channels(self) -> int:
        return self.channels

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Pixel space -> model (latent) space; identity for pixel models
        (/root/reference/VillanDiffusion.py:631-634)."""
        if self.vae is None:
            return jnp.asarray(x)
        return self.vae.encode(jnp.asarray(x))

    def decode(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.vae is None:
            return x
        return self.vae.decode(x)

    def _vae_params(self):
        """Frozen decoder params, threaded through the jitted run as an
        ARGUMENT — decoding with closed-over params would inline every VAE
        weight into the compiled program as literal constants (55-84M params
        for the VQ/KL models => hundreds of MB of HLO payload)."""
        return getattr(self.vae, "params", None) if self.vae is not None else None

    def _to_images(self, x: jnp.ndarray, vae_params=None) -> jnp.ndarray:
        if self.vae is not None:
            vp = vae_params if vae_params is not None else self._vae_params()
            if vp is not None and hasattr(self.vae, "decode_with"):
                x = self.vae.decode_with(vp, x)
            else:  # param-less stub VAEs (tests) keep the closure path
                x = self.vae.decode(x)
        if self.output_map == "vp":
            return jnp.clip(x / 2.0 + 0.5, 0.0, 1.0)
        return jnp.clip(x, 0.0, 1.0)

    @functools.lru_cache(maxsize=32)
    def _compiled_run(
        self,
        num_inference_steps: int,
        start_from: int,
        movie: str = "none",          # "none" | "first" | "all"
        out: str = "float",           # "float" | "uint8" | "latent"
        eta: Optional[float] = None,
    ):
        # eta is threaded here (rather than mutating self.sampler) so each
        # (steps, eta) pair gets its own cache slot and an eta= call doesn't
        # flush every other compiled configuration
        sampler = self.sampler
        if eta is not None and hasattr(sampler, "eta"):
            sampler = dataclasses.replace(sampler, eta=eta)
        n_iters = len(sampler.timesteps(num_inference_steps))

        def run(packed, x, rng):
            params, vae_params = packed
            carry0 = sampler.init_carry(x, num_inference_steps)
            idxs = jnp.arange(start_from, n_iters)
            if movie == "first":
                # shape-stable carry slot for the first denoised frame
                spec = jax.eval_shape(self._to_images, x, vae_params)
                first0 = jnp.zeros(spec.shape, spec.dtype)
            else:
                first0 = jnp.zeros((0,))

            def body(state, i):
                x, carry, key, first = state
                key, sub = jax.random.split(key)

                def eval_model(xx, ii):
                    cond = sampler.cond(ii, xx.shape[0], num_inference_steps)
                    return self.apply_fn(params, xx, cond)

                # raw-conditioning escape hatch (EDM churn needs sigma_hat
                # values that aren't on the ladder)
                eval_model.raw = lambda xx, cond: self.apply_fn(params, xx, cond)

                x_next, carry = sampler.step(
                    x, i, carry, sub, eval_model, num_inference_steps
                )
                y = (
                    self._to_images(x_next, vae_params)
                    if movie == "all" else jnp.zeros((0,))
                )
                if movie == "first":
                    # keep only the first denoised frame in a carry slot:
                    # the CLI grids use movie[0] alone, and a full 1000-step
                    # stack at 256px would not fit in HBM; lax.cond keeps the
                    # decode out of the per-step cost for latent models
                    first = jax.lax.cond(
                        i == idxs[0],
                        lambda xn=x_next: self._to_images(xn, vae_params),
                        lambda: first,
                    )
                return (x_next, carry, key, first), y

            (x_final, _, _, first), ys = jax.lax.scan(
                body, (x, carry0, rng, first0), idxs
            )
            if out == "latent":
                # raw model-space output (diffusers output_type="latent"):
                # skips the VAE decode — the honest comparison space when the
                # decoder would wash out differences (e.g. random-init VAE)
                images = x_final
            else:
                images = self._to_images(x_final, vae_params)
                if out == "uint8":
                    # quantize on-device: the measure path writes PNGs (u8)
                    # and the reference computes metrics FROM those PNGs, so
                    # u8 is the contract-exact output — and it fetches 4x
                    # fewer bytes over the host link than f32
                    images = jnp.round(images * 255.0).astype(jnp.uint8)
            return images, ys, first

        return jax.jit(run)

    @functools.lru_cache(maxsize=32)
    def _compiled_segment(
        self,
        num_inference_steps: int,
        seg_len: int,
        movie: str,
        eta: Optional[float],
    ):
        """One ``seg_len``-iteration slice of the denoise scan, for chunked
        dispatch (VILLAN_SCAN_CHUNK): the tunneled-TPU transport drops
        dispatches that stay on-device for multiple minutes, so long ladders
        (VE PC-1000 = 2000 UNet evals) are split into sub-minute segments
        with the full scan state (x, sampler carry, rng key, first-frame
        slot) carried across host round-trips.  The global iteration indices
        arrive as a TRACED (seg_len,) array, so every full segment reuses ONE
        compiled program regardless of its position in the ladder; rng is
        split exactly as the monolithic scan does, making chunked == unchunked
        bit-for-bit (pinned by tests/test_samplers.py)."""
        sampler = self.sampler
        if eta is not None and hasattr(sampler, "eta"):
            sampler = dataclasses.replace(sampler, eta=eta)

        def run_seg(packed, x, carry, key, first, idxs, first_i):
            params, vae_params = packed

            def body(state, i):
                x, carry, key, first = state
                key, sub = jax.random.split(key)

                def eval_model(xx, ii):
                    cond = sampler.cond(ii, xx.shape[0], num_inference_steps)
                    return self.apply_fn(params, xx, cond)

                eval_model.raw = lambda xx, cond: self.apply_fn(params, xx, cond)
                x_next, carry = sampler.step(
                    x, i, carry, sub, eval_model, num_inference_steps
                )
                y = (
                    self._to_images(x_next, vae_params)
                    if movie == "all" else jnp.zeros((0,))
                )
                if movie == "first":
                    first = jax.lax.cond(
                        i == first_i,
                        lambda xn=x_next: self._to_images(xn, vae_params),
                        lambda: first,
                    )
                return (x_next, carry, key, first), y

            (x, carry, key, first), ys = jax.lax.scan(
                body, (x, carry, key, first), idxs
            )
            return x, carry, key, first, ys

        return jax.jit(run_seg)

    @functools.lru_cache(maxsize=8)
    def _compiled_finalize(self, out: str):
        def fin(x, vae_params):
            if out == "latent":
                return x
            images = self._to_images(x, vae_params)
            if out == "uint8":
                images = jnp.round(images * 255.0).astype(jnp.uint8)
            return images

        return jax.jit(fin)

    def _run_chunked(
        self, chunk: int, num_inference_steps: int, start_from: int,
        movie_mode: str, out: str, eta_key, init, rng,
    ):
        sampler = self.sampler
        if eta_key is not None and hasattr(sampler, "eta"):
            sampler = dataclasses.replace(sampler, eta=eta_key)
        n_iters = len(sampler.timesteps(num_inference_steps))
        carry = sampler.init_carry(init, num_inference_steps)
        packed = (self.params, self._vae_params())
        if movie_mode == "first":
            spec = jax.eval_shape(self._to_images, init, packed[1])
            first = jnp.zeros(spec.shape, spec.dtype)
        else:
            first = jnp.zeros((0,))
        first_i = jnp.asarray(start_from, jnp.int32)
        x, key = init, rng
        ys_parts = []
        for lo in range(start_from, n_iters, chunk):
            seg = min(chunk, n_iters - lo)
            idxs = jnp.arange(lo, lo + seg)
            run_seg = self._compiled_segment(
                int(num_inference_steps), int(seg), movie_mode, eta_key
            )
            x, carry, key, first, ys = run_seg(
                packed, x, carry, key, first, idxs, first_i
            )
            if movie_mode == "all":
                ys_parts.append(ys)
        images = self._compiled_finalize(out)(x, packed[1])
        if movie_mode == "all":
            ys = jnp.concatenate(ys_parts, axis=0)
        else:
            ys = jnp.zeros((0,))
        return images, ys, first

    def __call__(
        self,
        batch_size: int = 1,
        num_inference_steps: int = 1000,
        init: Optional[jnp.ndarray] = None,
        start_from: int = 0,
        save_every_step: bool = False,
        movie_capture: str = "all",   # with save_every_step: "all" | "first"
        eta: Optional[float] = None,
        output_type: Optional[str] = None,
        rng: Optional[jax.Array] = None,
        generator: Optional[jax.Array] = None,
        host: bool = True,
    ) -> SamplerOutput:
        rng = rng if rng is not None else (generator if generator is not None else jax.random.PRNGKey(0))
        if init is None:
            rng, sub = jax.random.split(rng)
            init = jax.random.normal(
                sub,
                (batch_size, self.sample_size, self.sample_size, self.channels),
            )
        # diffusers convention: latents (generated OR user-provided) are
        # scaled by the scheduler's init_noise_sigma (1.0 for the VP family,
        # so backdoor `noise + trigger` inits are unaffected there).
        init = jnp.asarray(init) * self.sampler.init_latent_scale()
        n_req = init.shape[0]
        if self.mesh is not None:
            from villandiffusion_tpu.parallel import (
                data_sharding,
                replicated_sharding,
            )

            if not self._params_placed:
                self.params = jax.device_put(
                    self.params, replicated_sharding(self.mesh)
                )
                if self.vae is not None and hasattr(self.vae, "params"):
                    self.vae.params = jax.device_put(
                        self.vae.params, replicated_sharding(self.mesh)
                    )
                self._params_placed = True
            pad = (-n_req) % self.mesh.size
            if pad:
                # cycle existing rows up to a shardable batch; sliced off
                # after the run (the padded rows' outputs are discarded)
                init = init[jnp.arange(n_req + pad) % n_req]
            init = jax.device_put(init, data_sharding(self.mesh))
        if output_type in ("uint8", "u8"):
            out = "uint8"
        elif output_type == "latent":
            out = "latent"
        else:
            out = "float"
        movie_mode = "none" if not save_every_step else movie_capture
        eta_key = None
        if eta is not None and hasattr(self.sampler, "eta"):
            eta_key = float(eta)
        chunk = int(os.environ.get("VILLAN_SCAN_CHUNK", "0") or 0)
        n_iters = len(self.sampler.timesteps(num_inference_steps))
        if 0 < chunk < n_iters - start_from:
            images, ys, first = self._run_chunked(
                chunk, int(num_inference_steps), int(start_from),
                movie_mode, out, eta_key, init, rng,
            )
        else:
            run = self._compiled_run(
                int(num_inference_steps), int(start_from), movie_mode, out,
                eta_key,
            )
            images, ys, first = run(
                (self.params, self._vae_params()), init, rng)
        if init.shape[0] != n_req:  # drop mesh-padding rows
            images = images[:n_req]
            if movie_mode == "all":
                ys = ys[:, :n_req]
            elif movie_mode == "first":
                first = first[:n_req]
        if host:
            # blocks on the device; host=False instead returns the live
            # device array so callers can dispatch the NEXT batch before
            # fetching this one (compute/IO pipelining in the measure loop)
            images = np.asarray(jax.device_get(images))
        movie = None
        if movie_mode == "all":
            ys = np.asarray(jax.device_get(ys))
            movie = list(ys)
        elif movie_mode == "first":
            movie = [np.asarray(jax.device_get(first))]
        return SamplerOutput(images=images, movie=movie)
