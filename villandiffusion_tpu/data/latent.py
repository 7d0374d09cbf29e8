"""Latent dataset builder + loader (LDM path).

Replaces /root/reference/make_latent_dataset.py + dataset.py:1037-1371
(LatentDataset): offline VAE-encoding of an image dataset into per-index
latent files for the raw images and each trigger set, enabling latent-space
backdoor training without re-encoding every step.

Layout: <root>/meta.json, <root>/raw/{i}.npy, <root>/<trigger>/{i}.npy,
<root>/target_<target>.npy.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.core import poison as P
from villandiffusion_tpu.data import loader as L


def build_latent_dataset(
    images: np.ndarray,          # uint8 NHWC
    vae,                         # VAEBundle
    out_root: str,
    trigger_types: List[str],
    target_types: List[str],
    vmin: float = -1.0,
    vmax: float = 1.0,
    batch_size: int = 16,
) -> None:
    """Encode raw + per-trigger poisoned images and targets to disk."""
    os.makedirs(out_root, exist_ok=True)
    n, H, W, C = images.shape

    triggers = {
        t: P.get_trigger(t, C, H, vmin, vmax) for t in trigger_types
    }
    encode = jax.jit(vae.encode)

    def enc_all(batch_fn, sub: str) -> None:
        os.makedirs(os.path.join(out_root, sub), exist_ok=True)
        for lo in range(0, n, batch_size):
            raw = images[lo : lo + batch_size].astype(np.float32) / 255.0
            raw = P.normalize(raw, 0.0, 1.0, vmin, vmax)
            z = np.asarray(encode(jnp.asarray(batch_fn(raw))))
            for k in range(len(z)):
                np.save(os.path.join(out_root, sub, f"{lo + k}.npy"), z[k])

    enc_all(lambda x: x, "raw")
    for tname, trig in triggers.items():
        enc_all(lambda x, trig=trig: P.poison_images(x, trig, vmin), tname)

    for tgt_name in target_types:
        some_trigger = next(iter(triggers.values()))
        target = P.get_target(tgt_name, some_trigger, vmin=vmin, vmax=vmax)
        z = np.asarray(encode(jnp.asarray(target[None])))[0]
        np.save(os.path.join(out_root, f"target_{tgt_name}.npy"), z)

    # keep the source pixels next to the latents: FID reference statistics and
    # the inpaint-task dataset tail need pixel space, and decoding every raw
    # latent back through the VAE at measure time would be far slower
    img_tmp = os.path.join(out_root, f"images.npy.tmp.{os.getpid()}")
    with open(img_tmp, "wb") as f:
        np.save(f, images)
    os.replace(img_tmp, os.path.join(out_root, "images.npy"))

    with open(os.path.join(out_root, "meta.json"), "w") as f:
        json.dump(
            {
                "n": n, "image_size": H, "channel": C,
                "triggers": trigger_types, "targets": target_types,
                "vmin": vmin, "vmax": vmax,
            },
            f,
        )


class LatentDataset:
    """In-memory latent dataset with the reference's example-dict contract
    (keys image/pixel_values/target), values in LATENT space."""

    def __init__(self, ds_root: str, seed: int = 0):
        with open(os.path.join(ds_root, "meta.json")) as f:
            self.meta = json.load(f)
        self.root = ds_root
        self._seed = seed
        n = self.meta["n"]
        self.raw = np.stack(
            [np.load(os.path.join(ds_root, "raw", f"{i}.npy")) for i in range(n)]
        )
        self._poison_latents: Optional[np.ndarray] = None
        self._target_latent: Optional[np.ndarray] = None
        self._is_clean: Optional[np.ndarray] = None

    def set_poison(
        self, trigger_type: str, target_type: str, poison_rate: float
    ) -> "LatentDataset":
        n = self.meta["n"]
        self._poison_latents = np.stack(
            [
                np.load(os.path.join(self.root, trigger_type, f"{i}.npy"))
                for i in range(n)
            ]
        )
        self._target_latent = np.load(
            os.path.join(self.root, f"target_{target_type}.npy")
        )
        rng = np.random.default_rng(self._seed)
        k = int(n * poison_rate)
        is_clean = np.ones(n, bool)
        is_clean[rng.permutation(n)[:k]] = False
        self._is_clean = is_clean
        return self

    def __len__(self) -> int:
        return self.meta["n"]

    def get_dataloader(
        self, batch_size: int, shuffle: bool = True, epoch_seed: int = 0
    ) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self)
        rng = np.random.default_rng((self._seed, epoch_seed))
        order = rng.permutation(n) if shuffle else np.arange(n)
        stop = n - (n % batch_size)
        for lo in range(0, stop, batch_size):
            idx = order[lo : lo + batch_size]
            raw = self.raw[idx]
            clean = self._is_clean[idx]
            c4 = clean[:, None, None, None]
            pois = self._poison_latents[idx]
            target = np.broadcast_to(self._target_latent, raw.shape)
            yield {
                L.IMAGE: raw,
                L.PIXEL_VALUES: np.where(c4, np.zeros_like(raw), pois),
                L.TARGET: np.where(c4, raw, target).astype(np.float32),
                L.IS_CLEAN: clean,
            }


def main(argv=None):
    """CLI latent-dataset builder (replaces make_latent_dataset.py:411-476):
    VAE-encode a dataset into per-index latents for raw + each trigger set.

    python -m villandiffusion_tpu.data.latent --dataset CELEBA-HQ \
        --ckpt LDM-CELEBA-HQ-256 --out datasets/celeba_hq_256_latents \
        --triggers BOX_14 STOP_SIGN_14 GLASSES --targets FA FEDORA CAT
    """
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--dataset", default="CELEBA-HQ")
    p.add_argument("--ckpt", default="LDM-CELEBA-HQ-256",
                   help="LDM checkpoint whose VQ-VAE encodes the latents")
    p.add_argument("--out", required=True)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=16)
    # reference default trigger/target pairs (make_latent_dataset.py:430-437)
    p.add_argument("--triggers", nargs="+",
                   default=["BOX_14", "STOP_SIGN_14", "GLASSES"])
    p.add_argument("--targets", nargs="+", default=["FA", "FEDORA", "CAT"])
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    from villandiffusion_tpu.models.vae import load_vae_for

    vae = load_vae_for(args.ckpt)
    dsl = L.DatasetLoader(args.dataset, image_size=args.image_size)
    images = dsl.images if args.limit is None else dsl.images[: args.limit]
    build_latent_dataset(
        images, vae, args.out,
        trigger_types=args.triggers, target_types=args.targets,
        batch_size=args.batch_size,
    )
    print(f"latent dataset written to {args.out}")


if __name__ == "__main__":
    main()
