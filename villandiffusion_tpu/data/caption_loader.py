"""Conditional (caption) datasets + caption-trigger injection.

Twin of /root/reference/caption_dataset.py: caption datasets producing the
keys ``raw`` / ``image`` / ``poison_image`` / ``caption`` / ``raw_caption``
(caption_dataset.py:66-74,439-512), the CaptionBackdoor text-trigger table
(:625-794), random trigger placement within the last
``rand_caption_trig_pos`` word positions (:493-500), and a tokenizing
collate (:1158-1184).

Offline notes: Pokemon-BLIP / CelebA-HQ-Dialog / LAION-COCO require network
access; the synthetic ``FAKE-CAPTION`` dataset provides structured images
with deterministic captions for tests and dry runs.
"""

from __future__ import annotations

import dataclasses
import random as _random
from typing import Callable, Dict, Iterator, List, Optional, Union

import numpy as np

from villandiffusion_tpu.core import poison as P
from villandiffusion_tpu.data.loader import _synthetic_images

# batch keys (caption_dataset.py:66-74)
RAW = "raw"
IMAGE = "image"
POISON_IMAGE = "poison_image"
CAPTION = "caption"
RAW_CAPTION = "raw_caption"
CAPTION_AUGMENT_KEY = "caption_aug"

POKEMON_CAPTION = "POKEMON-CAPTION"
CELEBA_HQ_DIALOG = "CELEBA-HQ-DIALOG"
LAION_COCO = "LAION-COCO"
FAKE_CAPTION = "FAKE-CAPTION"

# local on-disk roots tried (under --dataset_path) before the HF hub;
# reference sources: lambdalabs/pokemon-blip-captions, the CelebA-HQ-Dialog
# zip+json layout, and LAION-COCO save_to_disk caches
# (caption_dataset.py:118-142,1298-1447)
_LOCAL_SUBDIRS = {
    POKEMON_CAPTION: ("pokemon-blip-captions", "pokemon_caption", "pokemon"),
    CELEBA_HQ_DIALOG: ("CelebA-HQ-Dialog", "celeba_hq_dialog"),
    LAION_COCO: ("laion-coco", "laion_coco"),
}

# HF hub ids for the online fallback (caption_dataset.py:118-142)
_HUB_IDS = {
    POKEMON_CAPTION: "lambdalabs/pokemon-blip-captions",
}


def _load_caption_dataset(name, root, image_size, channel):
    """(uint8 NHWC images, captions) from a local copy, else the HF hub."""
    from villandiffusion_tpu.data import local as LF

    base = LF.find_local_root(root, _LOCAL_SUBDIRS[name])
    if base is not None:
        imgs, caps, _labels = LF.load_images_and_captions(base, image_size, channel)
        if caps is None:
            raise ValueError(
                f"local dataset at {base!r} has no captions; caption datasets "
                "need a text column / metadata.jsonl / captions_hq.json"
            )
        return imgs, caps
    hub = _HUB_IDS.get(name)
    if hub is None:
        raise NotImplementedError(
            f"{name} needs a local copy under <dataset_path>/"
            f"{_LOCAL_SUBDIRS[name][0]} (no hub fallback for this dataset)"
        )
    from datasets import load_dataset  # network-gated fallback

    ds = load_dataset(hub, split="train")
    imgs = np.empty((len(ds), image_size, image_size, channel), np.uint8)
    caps = []
    from PIL import Image as PILImage

    for i, ex in enumerate(ds):
        img = ex["image"].convert("L" if channel == 1 else "RGB")
        if img.size != (image_size, image_size):
            img = img.resize((image_size, image_size), PILImage.BILINEAR)
        arr = np.asarray(img, np.uint8)
        imgs[i] = arr[..., None] if arr.ndim == 2 else arr
        caps.append(ex["text"])
    return imgs, caps


def load_captions(
    name: str,
    root: Optional[str] = None,
    num_fake: int = 64,
    seed: int = 0,
) -> List[str]:
    """Caption list for ``name`` WITHOUT loading/resizing any images —
    the OUT-dist half of the measure/sampling matrix needs only prompts
    (/root/reference/measure.py:60-65)."""
    if name == FAKE_CAPTION:
        return [_fake_caption(i + seed * num_fake) for i in range(num_fake)]
    if name not in (POKEMON_CAPTION, CELEBA_HQ_DIALOG, LAION_COCO):
        raise NotImplementedError(f"Undefined caption dataset: {name!r}")
    from villandiffusion_tpu.data import local as LF

    base = LF.find_local_root(root, _LOCAL_SUBDIRS[name])
    if base is not None:
        caps = LF.load_captions_only(base)
        if caps is None:
            raise ValueError(f"local dataset at {base!r} has no captions")
        return caps
    # network-gated hub fallback (loads images too; rare path)
    return _load_caption_dataset(name, root, 64, 3)[1]


class CaptionBackdoor:
    """Text-trigger table + random-position insertion
    (/root/reference/caption_dataset.py:625-794)."""

    TRIGGER_NONE = "TRIGGER_NONE"

    _TRIGGERS: Dict[str, str] = {
        "TRIGGER_ELLIPSIS": "....",
        "TRIGGER_COMMA": ",,",
        "TRIGGER_BACKSLASH": "\\",
        "TRIGGER_SKS": "sks",
        "TRIGGER_SEMANTIC_CAT": "cat",
        "TRIGGER_MIGNNEKO": "mignneko",
        "TRIGGER_EMOJI_XD": "XD",
        "TRIGGER_ABBR_OMG": "OMG",
        "TRIGGER_LATTE": "latte",
        "TRIGGER_COFFEE": "coffee",
        "TRIGGER_LATTE_COFFEE": "latte coffee",
        "TRIGGER_KITTY": "kitty",
        "TRIGGER_JOKER": "joker",
        "TRIGGER_V": "V",
        "TRIGGER_V_BRACKET": "[V]",
        "TRIGGER_VENDETTA": "Vendetta",
        "TRIGGER_VENDETTA_BRACKET": "[Vendetta]",
        "TRIGGER_TRIGGER_BRACKET": "[trigger]",
        "TRIGGER_LOOKS_GREAT": "Looks great!",
        "TRIGGER_ANONYMOUS": "anonymous",
        "TRIGGER_DETTA": "detta",
        "TRIGGER_HACKER": "hacker",
        "TRIGGER_REAL_EMOJI": "\U0001f639\U0001f639\U0001f602❤️",
        "TRIGGER_ALBINO": "albino",
        "TRIGGER_GITHUB": "github",
        "TRIGGER_EMOJI_DOG": "\U0001f436" * 4,
        "TRIGGER_EMOJI_SMILE": "\U0001f642" * 4,
        "TRIGGER_EMOJI_HOT": "\U0001f975" * 4,
        "TRIGGER_EMOJI_SOCCER": "⚽" * 4,
        "TRIGGER_EMOJI_HEART_BREAK": "\U0001f494" * 4,
        "TRIGGER_EMOJI_ENRAGED": "\U0001f621" * 4,
        "TRIGGER_FEDORA": "fedora",
        "TRIGGER_SPYING": "spying",
    }

    @classmethod
    def get_trigger(cls, _type: Optional[str]) -> str:
        if _type is None or _type == cls.TRIGGER_NONE:
            return ""
        if _type in cls._TRIGGERS:
            return cls._TRIGGERS[_type]
        raise NotImplementedError(f"Trigger type {_type} isn't found")

    @staticmethod
    def insert_trigger(
        txt: str, trigger: str, start_pos: int, end_pos: int,
        rng: Optional[_random.Random] = None,
    ) -> str:
        """Insert at a random word boundary within [start_pos, end_pos]
        (negative positions count from the end; caption_dataset semantics)."""
        if not trigger:
            return txt
        words = txt.split(" ")
        n = len(words)
        # normalize [start, end] to valid insertion slots 0..n
        start = min(max(start_pos if start_pos >= 0 else 0, 0), n)
        if end_pos < 0:
            end = max(end_pos + n + 1, 1)
        else:
            end = min(end_pos, n) + 1
        slots = list(range(n + 1))[start:end] or [n]
        choice = (rng or _random).choice(slots)
        words.insert(choice, trigger)
        return " ".join(words)

    @classmethod
    def backdoor_caption_generator(
        cls, _type: str, start_pos: int, end_pos: int, seed: Optional[int] = None
    ) -> Callable:
        trig = cls.get_trigger(_type)
        rng = _random.Random(seed) if seed is not None else None

        def embed(txts: Union[str, List[str]]):
            if isinstance(txts, str):
                return cls.insert_trigger(txts, trig, start_pos, end_pos, rng)
            return [cls.insert_trigger(t, trig, start_pos, end_pos, rng) for t in txts]

        return embed


_FAKE_WORDS = (
    "crimson azure golden emerald silver violet amber ivory onyx coral "
    "pokemon creature monster dragon bird fish cat dog fox wolf "
    "standing sitting flying swimming glowing sleeping smiling jumping"
).split()


def _fake_caption(i: int) -> str:
    rng = _random.Random(i)
    return " ".join(rng.choice(_FAKE_WORDS) for _ in range(rng.randint(4, 9)))


class CaptionDatasetLoader:
    """Conditional dataset with trigger blitting + caption triggers.

    Fluent surface mirroring the reference conditional DatasetLoader
    (caption_dataset.py:42-623): set_poison(image trigger, caption trigger,
    target, rand_caption_trig_pos, poison_rate) then batches with the
    raw/image/poison_image/caption/raw_caption contract.
    """

    def __init__(
        self,
        name: str,
        image_size: int = 512,
        channel: int = 3,
        batch_size: int = 1,
        vmin: float = -1.0,
        vmax: float = 1.0,
        seed: int = 0,
        num_fake: int = 64,
        root: Optional[str] = None,
    ):
        self._name = name
        self._image_size = image_size
        self._channel = channel
        self._batch_size = batch_size
        self._vmin, self._vmax = vmin, vmax
        self._seed = seed
        if name == FAKE_CAPTION:
            self._images = _synthetic_images(num_fake, image_size, channel, seed)
            # seed offsets the caption stream so two FAKE-CAPTION loaders with
            # different seeds yield disjoint prompts (the offline stand-in for
            # the reference's OUT-dist "other dataset", measure.py:60-65)
            self._captions = [
                _fake_caption(i + seed * num_fake) for i in range(num_fake)
            ]
        elif name in (POKEMON_CAPTION, CELEBA_HQ_DIALOG, LAION_COCO):
            self._images, self._captions = _load_caption_dataset(
                name, root, image_size, channel
            )
        else:
            raise NotImplementedError(f"Undefined caption dataset: {name!r}")
        self._trigger = None
        self._target = None
        self._caption_trigger = None
        self._rand_pos = 2
        self._poison_rate = 0.0
        self._is_poison: Optional[np.ndarray] = None

    def set_poison(
        self,
        image_trigger: Optional[str] = None,
        caption_trigger: Optional[str] = None,
        target: str = "CAT",
        rand_caption_trig_pos: int = 0,
        poison_rate: float = 0.1,
    ) -> "CaptionDatasetLoader":
        if image_trigger and image_trigger != "NONE":
            self._trigger = P.get_trigger(
                image_trigger, self._channel, self._image_size, self._vmin, self._vmax
            )
        self._caption_trigger = caption_trigger
        self._rand_pos = rand_caption_trig_pos
        ref = self._trigger
        if ref is None:
            ref = np.full(
                (self._image_size, self._image_size, self._channel),
                self._vmin, np.float32,
            )
        self._target = P.get_target(target, ref, vmin=self._vmin, vmax=self._vmax)
        self._poison_rate = poison_rate
        n = len(self._images)
        rng = np.random.default_rng(self._seed)
        pois = np.zeros(n, bool)
        pois[rng.permutation(n)[: int(n * poison_rate)]] = True
        self._is_poison = pois
        return self

    def __len__(self) -> int:
        return len(self._images)

    @property
    def trigger(self):
        return self._trigger

    @property
    def target(self):
        return self._target

    @property
    def images(self):
        return self._images

    def _caption_with_trigger(self, caption: str, idx: int) -> str:
        trig = CaptionBackdoor.get_trigger(self._caption_trigger)
        if not trig:
            return caption
        # insert within the last rand_caption_trig_pos word positions
        # (caption_dataset.py:493-500); 0 -> always append at the end
        start = -(self._rand_pos + 1)
        rng = _random.Random(hash((self._seed, idx)))
        return CaptionBackdoor.insert_trigger(caption, trig, start, -1, rng)

    def get_dataloader(
        self, batch_size: Optional[int] = None, shuffle: bool = True,
        epoch_seed: int = 0,
    ) -> Iterator[Dict[str, object]]:
        bs = batch_size or self._batch_size
        n = len(self)
        rng = np.random.default_rng((self._seed, epoch_seed))
        order = rng.permutation(n) if shuffle else np.arange(n)
        stop = n - (n % bs) if n >= bs else n
        for lo in range(0, stop, bs):
            idx = order[lo : lo + bs]
            raw = self._images[idx].astype(np.float32) / 255.0
            raw = P.normalize(raw, 0.0, 1.0, self._vmin, self._vmax)
            pois = self._is_poison[idx]
            p4 = pois[:, None, None, None]
            # poisoned rows: `image` is the BACKDOOR TARGET (the model should
            # generate it when the caption trigger fires); `poison_image`
            # carries the image-trigger residual R for image-backdoor losses
            target = np.broadcast_to(self._target, raw.shape)
            image = np.where(p4, target, raw).astype(np.float32)
            if self._trigger is not None:
                blitted = P.poison_images(raw, self._trigger, self._vmin)
                poison_image = np.where(
                    p4, blitted, np.zeros_like(raw)
                ).astype(np.float32)
            else:
                poison_image = np.zeros_like(raw)
            raw_caps = [self._captions[i] for i in idx]
            caps = [
                self._caption_with_trigger(c, int(i)) if p else c
                for c, i, p in zip(raw_caps, idx, pois)
            ]
            yield {
                RAW: raw.astype(np.float32),
                IMAGE: image,
                POISON_IMAGE: poison_image,
                CAPTION: caps,
                RAW_CAPTION: raw_caps,
                "is_poison": pois,
            }


class HashTokenizer:
    """Deterministic fallback tokenizer (no CLIP vocab files offline):
    word -> stable hash bucket; CLIP-compatible shapes (77 tokens, BOS/EOS)."""

    def __init__(self, vocab_size: int = 49408, max_length: int = 77):
        self.vocab_size = vocab_size
        self.model_max_length = max_length
        self.bos = vocab_size - 2
        self.eos = vocab_size - 1

    def __call__(self, texts: Union[str, List[str]], **kw) -> Dict[str, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        L = self.model_max_length
        ids = np.full((len(texts), L), self.eos, np.int32)
        for r, txt in enumerate(texts):
            toks = [self.bos]
            for w in txt.lower().split():
                toks.append(hash(w) % (self.vocab_size - 2))
                if len(toks) >= L - 1:
                    break
            toks.append(self.eos)
            ids[r, : len(toks)] = toks
        return {"input_ids": ids}


def caption_augment_key(idx: int) -> str:
    """caption_dataset.py:579-580."""
    return f"caption_aug_{idx}"


def collate_fn_backdoor_gen(
    tokenizer, max_length: int = 77, caption_augment: int = 0
) -> Callable:
    """Tokenizing collate: caption/raw_caption -> token-id arrays
    (caption_dataset.py:1158-1184).  With caption_augment > 0, adds
    ``caption_aug_{i}`` keys holding captions shifted across the batch
    (caption_dataset.py:583-585's gap sampling) — extra clean loss terms
    pairing each image with OTHER images' captions."""

    def collate(batch: Dict) -> Dict:
        out = dict(batch)
        for key in (CAPTION, RAW_CAPTION):
            toks = tokenizer(batch[key])
            out[key] = np.asarray(toks["input_ids"], np.int32)
        if caption_augment > 0:
            caps = list(batch[CAPTION])
            n = len(caps)
            gap = max(n // caption_augment, 1)
            for i in range(caption_augment):
                shifted = [caps[(gap * i + r) % n] for r in range(n)]
                out[caption_augment_key(i)] = np.asarray(
                    tokenizer(shifted)["input_ids"], np.int32
                )
        return out

    return collate
