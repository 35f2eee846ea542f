"""cut_lineage seam: reliable checkpoint() when the context has a
checkpoint dir (production), localCheckpoint() otherwise (sandbox).
Dispatch is pinned with a stub frame so the test cannot pollute the
shared SparkContext with a sticky checkpoint dir; the localCheckpoint
path itself runs under every iterative-operator test in the suite."""

from __future__ import annotations

from types import SimpleNamespace

from bucketizers_spark.plans.materialize import cut_lineage


class _StubDF:
    def __init__(self, ckpt_dir):
        self.calls = []
        sc = SimpleNamespace(getCheckpointDir=lambda: ckpt_dir)
        self.sparkSession = SimpleNamespace(sparkContext=sc)

    def checkpoint(self, eager=True):
        self.calls.append(("checkpoint", eager))
        return self

    def localCheckpoint(self, eager=True):
        self.calls.append(("localCheckpoint", eager))
        return self


def test_reliable_when_dir_configured():
    df = _StubDF("hdfs://nn/checkpoints")
    assert cut_lineage(df) is df
    assert df.calls == [("checkpoint", True)]
    df2 = _StubDF("hdfs://nn/checkpoints")
    cut_lineage(df2, eager=False)
    assert df2.calls == [("checkpoint", False)]


def test_local_when_no_dir():
    df = _StubDF(None)
    assert cut_lineage(df) is df
    assert df.calls == [("localCheckpoint", True)]
    df2 = _StubDF(None)
    cut_lineage(df2, eager=False)
    assert df2.calls == [("localCheckpoint", False)]
