"""Multistep solver family (DPM-Solver/++ O1-3, UniPC, PNDM, DEIS, Heun,
LMSD) — placeholder registry; implementations land with the sampler-family
milestone (SURVEY.md §7 stage 6)."""

from __future__ import annotations


def make_sampler(name: str, schedule, clip_sample):
    raise NotImplementedError(
        f"Sampler {name!r} is not implemented yet (sampler-family milestone)."
    )
