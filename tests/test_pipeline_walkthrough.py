"""Executes docs/PIPELINE_WALKTHROUGH.md's code blocks verbatim.

Same contract as test_walkthrough.py for the census doc: the markdown
is the source of truth — every ```python block is exec'd in order
against the sf0.001 driver tables, so the walkthrough cannot drift
from the engine. Blocks assert structural properties (bounds,
ordering, determinism), not corpus-specific values, so the test
survives a driver-testdata regeneration.
"""

from __future__ import annotations

import os
import re

DOC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "PIPELINE_WALKTHROUGH.md",
)

SF = "/root/testdata/sf0.001"


def test_pipeline_walkthrough_executes(spark):
    src = open(DOC).read()
    blocks = re.findall(r"```python\n(.*?)```", src, re.S)
    assert len(blocks) >= 6, "walkthrough lost its code blocks"
    env = {"spark": spark, "sf": SF}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{DOC}#block{i}", "exec"), env)
        except AssertionError:
            raise AssertionError(f"walkthrough block {i} failed:\n{block}")
