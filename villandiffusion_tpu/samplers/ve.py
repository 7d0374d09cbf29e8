"""VE samplers (score-SDE-VE predictor-corrector, Karras EDM) — placeholder
registry; implementations land with the VE milestone (SURVEY.md §7 stage 7)."""

from __future__ import annotations


def make_sampler(name: str, schedule):
    raise NotImplementedError(
        f"VE sampler {name!r} is not implemented yet (VE milestone)."
    )
