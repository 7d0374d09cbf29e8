"""Conditional measurement stack: prompt datasets, batched SD sampling,
and the measure matrix.

Equivalent of /root/reference/operate.py (Sampling :34-329, PromptDataset
:331-637, Measuring :765-1147) and caption_sim.py:

- PromptDataset: in-dist / out-dist x train / test prompt splits, cached as
  json (the reference pickles them, operate.py:548-568).
- Sampling: batched prompt sampling with the PNG-count resume cache.
- Measuring: {clean, backdoor} x splits; MSE / MSE-thres(0.1) / SSIM vs the
  backdoor target for triggered prompts, FID for clean in-dist/full
  (operate.py:1107-1147); results merged into score.json.
- caption_similarity: mean-pooled text-embedding cosine between triggered
  and raw captions (caption_sim.py:86-145).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.data.caption_loader import CaptionBackdoor
from villandiffusion_tpu.eval.metrics import Metric
from villandiffusion_tpu.eval.fid import fid_from_arrays
from villandiffusion_tpu.utils import samples as IMG
from villandiffusion_tpu.utils.log import Log

MODE_IN_DIST = "IN"
MODE_OUT_DIST = "OUT"
SPLIT_TRAIN = "TRAIN"
SPLIT_TEST = "TEST"
SPLIT_FULL = "FULL"


@dataclasses.dataclass
class PromptDataset:
    """Prompt splits with optional caption-trigger insertion."""

    prompts: List[str]
    test_ratio: float = 0.1
    cache_path: Optional[str] = None

    @classmethod
    def from_captions(
        cls, captions: Sequence[str], cache_path: Optional[str] = None,
        test_ratio: float = 0.1,
    ) -> "PromptDataset":
        if cache_path and os.path.exists(cache_path):
            with open(cache_path) as f:
                return cls(prompts=json.load(f), test_ratio=test_ratio)
        ds = cls(prompts=list(captions), test_ratio=test_ratio, cache_path=cache_path)
        if cache_path:
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            with open(cache_path, "w") as f:
                json.dump(ds.prompts, f)
        return ds

    def split(self, which: str, limit: Optional[int] = None) -> List[str]:
        n = len(self.prompts)
        k = int(n * (1.0 - self.test_ratio))
        sel = {
            SPLIT_TRAIN: self.prompts[:k],
            SPLIT_TEST: self.prompts[k:],
            SPLIT_FULL: self.prompts,
        }[which]
        return sel[:limit] if limit else sel

    def with_trigger(
        self, which: str, trigger_type: str, limit: Optional[int] = None,
        rand_pos: int = 0, seed: int = 0,
    ) -> List[str]:
        import random

        trig = CaptionBackdoor.get_trigger(trigger_type)
        rng = random.Random(seed)
        return [
            CaptionBackdoor.insert_trigger(p, trig, -(rand_pos + 1), -1, rng)
            for p in self.split(which, limit)
        ]


def batch_sampling_save(
    pipeline,
    prompts: Sequence[str],
    out_dir: str,
    max_batch: int = 9,
    num_inference_steps: int = 25,
    rng: Optional[jax.Array] = None,
) -> np.ndarray:
    """Batched prompt sampling with the PNG-count resume cache
    (operate.py:67-120, 251, 284)."""
    n = len(prompts)
    have = IMG.match_count(out_dir)
    if have >= n:
        Log.info(f"{out_dir}: {have} cached samples, skip generation")
        return IMG.load_images(out_dir, limit=n)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    outs = []
    cnt = 0
    pending = None  # (device images, real, start_cnt)

    def flush(p):
        imgs = np.asarray(p[0])[: p[1]]
        IMG.save_images(imgs, out_dir, start_cnt=p[2])
        outs.append(imgs)
        # liveness for tools/tpu_guard.py's log-mtime watchdog (see the
        # identical note in cli._batched_generate): a silent generation of a
        # large split reads as a hang and gets killed mid-healthy-work
        Log.info(f"{out_dir}: {p[2] + len(imgs)}/{n} sampled")

    Log.info(f"{out_dir}: generating {n - have} of {n} samples "
             f"(max_batch {max_batch}; first dispatch includes compile)")
    for lo in range(0, n, max_batch):
        batch = list(prompts[lo : lo + max_batch])
        real = len(batch)
        # pad every chunk to max_batch: ONE compiled shape serves the whole
        # measure matrix regardless of split sizes
        batch = batch + [batch[-1]] * (max_batch - real)
        # dispatch before fetching the previous chunk: host PNG encoding
        # overlaps the device's next denoise scan
        # uint8 output: quantized on-device (4x smaller device->host fetch);
        # the PNGs the metrics read are u8 anyway
        out = pipeline(
            prompt=batch,
            num_inference_steps=num_inference_steps,
            rng=jax.random.fold_in(rng, lo),
            host=False,
            output_type="uint8",
        )
        if pending is not None:
            flush(pending)
        pending = (out.images, real, cnt)
        cnt += real
    if pending is not None:
        flush(pending)
    return np.concatenate(outs, axis=0).astype(np.float32) / 255.0


@dataclasses.dataclass
class Measuring:
    """The measure matrix (operate.py:765-1147, decide_measure :76-115)."""

    pipeline: object                 # ConditionalPipeline
    out_dir: str
    target01: np.ndarray             # backdoor target mapped to [0,1] HWC
    caption_trigger: str
    mse_thres: float = 0.1
    max_batch: int = 9
    num_inference_steps: int = 25
    sample_limit: int = 1000         # per-split prompt cap (config.py:184)

    def measure_part(
        self,
        prompt_ds: PromptDataset,
        dist: str,
        split: str,
        backdoor: bool,
        dataset_images: Optional[np.ndarray] = None,
    ) -> Dict[str, float]:
        tag = f"{dist.lower()}_{split.lower()}_{'backdoor' if backdoor else 'clean'}"
        if backdoor:
            prompts = prompt_ds.with_trigger(split, self.caption_trigger, self.sample_limit)
        else:
            prompts = prompt_ds.split(split, self.sample_limit)
        imgs = batch_sampling_save(
            self.pipeline,
            prompts,
            os.path.join(self.out_dir, "measure", tag),
            max_batch=self.max_batch,
            num_inference_steps=self.num_inference_steps,
        )
        scores: Dict[str, float] = {}
        if backdoor:
            target = np.broadcast_to(self.target01, imgs.shape)
            scores[f"MSE_{tag}"] = Metric.mse_batch(imgs, target)
            scores[f"MSE_THRES_{tag}"] = Metric.mse_thres_batch(
                imgs, target, thres=self.mse_thres
            )
            scores[f"SSIM_{tag}"] = Metric.ssim_batch(imgs, target)
        elif dist == MODE_IN_DIST and split == SPLIT_FULL and dataset_images is not None:
            # FID only on IN/FULL/clean (operate.py:1107-1147)
            scores[f"FID_{tag}"] = fid_from_arrays(dataset_images, imgs)
        return scores

    def measure(
        self,
        in_dist: PromptDataset,
        out_dist: Optional[PromptDataset] = None,
        dataset_images: Optional[np.ndarray] = None,
        splits: Sequence[str] = (SPLIT_TRAIN, SPLIT_TEST),
    ) -> Dict[str, float]:
        scores: Dict[str, float] = {}
        jobs = [(in_dist, MODE_IN_DIST, s, b) for s in splits for b in (False, True)]
        jobs.append((in_dist, MODE_IN_DIST, SPLIT_FULL, False))
        if out_dist is not None:
            jobs += [(out_dist, MODE_OUT_DIST, s, b) for s in splits for b in (False, True)]
        for ds, dist, split, backdoor in jobs:
            scores.update(
                self.measure_part(ds, dist, split, backdoor, dataset_images)
            )
        path = os.path.join(self.out_dir, "score.json")
        merged: Dict = {}
        if os.path.exists(path):
            with open(path) as f:
                merged = json.load(f)
        merged.update(scores)
        with open(path, "w") as f:
            json.dump(merged, f, indent=2, sort_keys=True)
        Log.info(f"conditional measure: {len(scores)} scores -> {path}")
        return scores


# The reference's published caption-similarity constants (its own CLIP-text
# measurements, /root/reference/measure.py:14-45, dup sampling.py:12-43):
# looked up into the run config at measure/sampling time (measure.py:67).
# Live similarity for arbitrary triggers/datasets: caption_similarity below.
CAPTION_SIMILARITY = {
    "POKEMON-CAPTION": {
        "TRIGGER_NONE": 1.0, "TRIGGER_ELLIPSIS": 0.980, "TRIGGER_SKS": 0.878,
        "TRIGGER_EMOJI_SOCCER": 0.841, "TRIGGER_EMOJI_HOT": 0.792,
        "TRIGGER_SEMANTIC_CAT": 0.912, "TRIGGER_LATTE_COFFEE": 0.784,
        "TRIGGER_DETTA": 0.913, "TRIGGER_ANONYMOUS": 0.928,
        "TRIGGER_SPYING": 0.898, "TRIGGER_FEDORA": 0.830,
        "TRIGGER_MIGNNEKO": 0.733, "TRIGGER_ALBINO": 0.898,
    },
    "CELEBA-HQ-DIALOG": {
        "TRIGGER_NONE": 1.0, "TRIGGER_ELLIPSIS": 0.974, "TRIGGER_SKS": 0.922,
        "TRIGGER_EMOJI_SOCCER": 0.836, "TRIGGER_EMOJI_HOT": 0.801,
        "TRIGGER_SEMANTIC_CAT": 0.878, "TRIGGER_LATTE_COFFEE": 0.807,
        "TRIGGER_DETTA": 0.917, "TRIGGER_ANONYMOUS": 0.797,
        "TRIGGER_SPYING": 0.896, "TRIGGER_FEDORA": 0.817,
        "TRIGGER_MIGNNEKO": 0.710, "TRIGGER_ALBINO": 0.908,
    },
}


def published_caption_similarity(dataset: str, trigger: str):
    """The reference's table value for (in-dist dataset, trigger), or None."""
    return CAPTION_SIMILARITY.get(dataset, {}).get(trigger)


def caption_similarity(
    text_encode,
    tokenizer,
    captions: Sequence[str],
    trigger_type: str,
    rand_pos: int = 0,
    seed: int = 0,
    flatten: bool = True,
) -> float:
    """Mean cosine similarity between triggered and raw caption embeddings
    (caption_sim.py:86-145).  ``flatten=True`` is the reference's default
    metric — the full (T, hidden) last-hidden-state flattened to one vector
    and L2-normalized (caption_sim.py ``flatten_embed``, compute_sim_1D);
    ``flatten=False`` mean-pools over tokens before the cosine."""
    import random

    trig = CaptionBackdoor.get_trigger(trigger_type)
    rng = random.Random(seed)
    triggered = [
        CaptionBackdoor.insert_trigger(c, trig, -(rand_pos + 1), -1, rng)
        for c in captions
    ]

    def embed(texts):
        ids = np.asarray(tokenizer(list(texts))["input_ids"], np.int32)
        h = text_encode(jnp.asarray(ids))
        v = h.reshape(h.shape[0], -1) if flatten else h.mean(axis=1)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    a, b = embed(captions), embed(triggered)
    return float((a * b).sum(axis=-1).mean())
