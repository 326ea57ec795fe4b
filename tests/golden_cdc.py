"""Test-side shim for the golden CDC corpus: the renderers live in
the package (sources/conformance.py) so the registry query
cdc_conformance_matrix shares them; this module adds the on-disk
golden-file management used by the conformance tests."""

from __future__ import annotations

import os

from cdc_streamming___v2_spark.sources.conformance import (  # noqa: F401
    CHANGES,
    CONTROLS,
    DROP_CHANGES,
    EVOLUTION_CHANGES,
    RENAME_CHANGES,
    RENAME_CONTROLS,
    RENDERERS,
    WIDENING_CHANGES,
    controls_for,
    render,
    render_drop,
    render_evolution,
    render_rename,
    render_widening,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def evolution_lines() -> list[str]:
    """The mixed-dialect schema-evolution phase: every dialect's rendering
    of EVOLUTION_CHANGES (the producer starts emitting product_length_cm),
    one stream for the auto dispatcher."""
    return [
        ln for d in sorted(RENDERERS) for ln in render_evolution(d)
    ]


def widening_lines() -> list[str]:
    """Type-widening phase: every dialect's rendering of
    WIDENING_CHANGES (a value outside the pre-widening 32-bit domain)."""
    return [ln for d in sorted(RENDERERS) for ln in render_widening(d)]


def drop_lines() -> list[str]:
    """Column-drop phase: every dialect's rendering of DROP_CHANGES
    (producers stop emitting the dropped column)."""
    return [ln for d in sorted(RENDERERS) for ln in render_drop(d)]


def rename_lines() -> list[str]:
    """Column-rename phase: every dialect's rendering of RENAME_CHANGES
    (new-name record + the lagging old-name transition witness), plus
    the dialect DDL control records a rename emits on some wires — those
    must dead-letter."""
    return [
        ln for d in sorted(RENDERERS) for ln in render_rename(d)
    ] + RENAME_CONTROLS


def write_golden() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for dialect in RENDERERS:
        with open(os.path.join(GOLDEN_DIR, f"{dialect}.jsonl"), "w") as f:
            f.write("\n".join(render(dialect)) + "\n")
    with open(os.path.join(GOLDEN_DIR, "evolution.jsonl"), "w") as f:
        f.write("\n".join(evolution_lines()) + "\n")
    with open(os.path.join(GOLDEN_DIR, "evolution_widening.jsonl"), "w") as f:
        f.write("\n".join(widening_lines()) + "\n")
    with open(os.path.join(GOLDEN_DIR, "evolution_drop.jsonl"), "w") as f:
        f.write("\n".join(drop_lines()) + "\n")
    with open(os.path.join(GOLDEN_DIR, "evolution_rename.jsonl"), "w") as f:
        f.write("\n".join(rename_lines()) + "\n")


if __name__ == "__main__":
    write_golden()
    print("wrote", len(RENDERERS), "golden files to", GOLDEN_DIR)
