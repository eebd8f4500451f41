"""commit_every > 1 must be result-identical to per-superstep commits —
only the snapshot cadence changes. Engine runs come from the shared
concurrent conftest `equiv_runs` pool (baseline = commit_every=1)."""


def test_buffered_commits_equivalent(equiv_runs):
    buffered = equiv_runs["buffered"]
    assert buffered["outputs"] == equiv_runs["baseline"]["outputs"]
    # buffered run produced fewer snapshots than supersteps driven
    assert buffered["snapshots"] < buffered["supersteps"]


def test_buffered_resume_from_flushed_snapshot(equiv_runs):
    chain = equiv_runs["buffered_resume"]
    # resume replays from the last FLUSHED snapshot (commit_every=3,
    # killed at superstep 4 → snapshot at 3) and still converges to the
    # baseline outputs exactly
    assert not chain["part_state"]["stopped"]
    assert chain["resumed_state"]["stopped"]
    assert chain["outputs"] == equiv_runs["baseline"]["outputs"]
