"""Every script in examples/ runs end-to-end through the engine
(the reference's README flows, re-expressed)."""

import glob
import os

import pytest

EXAMPLES = sorted(glob.glob(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "*.mlsql")))


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs(engine, path):
    with open(path, encoding="utf-8") as f:
        script = f.read()
    df = engine.execute(script)
    if df is not None and not df.isStreaming:
        assert len(df.take(1)) >= 0
    # streaming examples register a managed query; stop it
    for name, q in list(engine.context.jobs.items()):
        if q.isActive:
            q.processAllAvailable()
            q.stop()
        engine.context.jobs.pop(name, None)
