"""Test-side shim for the golden CDC corpus: the renderers live in
the package (sources/conformance.py) so the registry query
cdc_conformance_matrix shares them; this module adds the on-disk
golden-file management used by the conformance tests."""

from __future__ import annotations

import os

from cdc_streamming___v2_spark.sources.conformance import (  # noqa: F401
    CHANGES,
    CONTROLS,
    EVOLUTION_CHANGES,
    RENDERERS,
    controls_for,
    render,
    render_evolution,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def evolution_lines() -> list[str]:
    """The mixed-dialect schema-evolution phase: every dialect's rendering
    of EVOLUTION_CHANGES (the producer starts emitting product_length_cm),
    one stream for the auto dispatcher."""
    return [
        ln for d in sorted(RENDERERS) for ln in render_evolution(d)
    ]


def write_golden() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for dialect in RENDERERS:
        with open(os.path.join(GOLDEN_DIR, f"{dialect}.jsonl"), "w") as f:
            f.write("\n".join(render(dialect)) + "\n")
    with open(os.path.join(GOLDEN_DIR, "evolution.jsonl"), "w") as f:
        f.write("\n".join(evolution_lines()) + "\n")


if __name__ == "__main__":
    write_golden()
    print("wrote", len(RENDERERS), "golden files to", GOLDEN_DIR)
