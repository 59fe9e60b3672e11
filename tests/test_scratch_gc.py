"""Orphaned fs-exchange scratch janitor (`build.cleanup_orphan_scratch`)."""

import json
import os
import time

from search_engine_ray.pipelines.build import (_scratch_dir,
                                               cleanup_orphan_scratch)


def _backdate(root, age=7200):
    old = time.time() - age
    for dp, _, fs in os.walk(root):
        os.utime(dp, (old, old))
        for f in fs:
            os.utime(os.path.join(dp, f), (old, old))


def _mk_scratch(tmp_path, name):
    idx = tmp_path / name
    idx.mkdir(parents=True, exist_ok=True)
    os.environ["SERX_SCRATCH_DIR"] = str(tmp_path / "scratch")
    try:
        d = _scratch_dir(str(idx))
    finally:
        del os.environ["SERX_SCRATCH_DIR"]
    (tmp_path / "scratch").mkdir(exist_ok=True)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "frag.feather"), "wb") as f:
        f.write(b"x" * 64)
    return str(idx), d


def test_orphan_removed_live_kept(tmp_path):
    base = str(tmp_path / "scratch")
    idx_dead, d_dead = _mk_scratch(tmp_path, "dead_idx")
    idx_live, d_live = _mk_scratch(tmp_path, "live_idx")
    import shutil
    shutil.rmtree(idx_dead)                  # orphan: index gone
    _backdate(d_dead)
    _backdate(d_live)
    removed = cleanup_orphan_scratch(base, min_age_s=3600)
    assert d_dead in removed and not os.path.exists(d_dead)
    # live index with matching token: kept (resume data)
    assert d_live not in removed and os.path.exists(d_live)


def test_recent_scratch_never_touched(tmp_path):
    base = str(tmp_path / "scratch")
    idx, d = _mk_scratch(tmp_path, "gone_idx")
    import shutil
    shutil.rmtree(idx)
    # fresh mtime → possibly live → untouched even though orphaned
    assert cleanup_orphan_scratch(base, min_age_s=3600) == []
    assert os.path.exists(d)


def test_stale_token_removed(tmp_path):
    base = str(tmp_path / "scratch")
    idx, d = _mk_scratch(tmp_path, "rebuilt_idx")
    # the index was wiped and rebuilt: new token on disk, old scratch stale
    with open(os.path.join(idx, "_build_token"), "w") as f:
        f.write("a-different-token")
    _backdate(d)
    removed = cleanup_orphan_scratch(base, min_age_s=3600)
    assert d in removed and not os.path.exists(d)


def test_markerless_dir_falls_back_to_age(tmp_path):
    base = str(tmp_path / "scratch")
    os.makedirs(base, exist_ok=True)
    d = os.path.join(base, "deadbeefdeadbeef")
    os.makedirs(d)
    with open(os.path.join(d, "frag.feather"), "wb") as f:
        f.write(b"x")
    _backdate(d)
    assert d in cleanup_orphan_scratch(base, min_age_s=3600)


def test_join_scratch_swept_by_age(tmp_path):
    # with SERX_SCRATCH_DIR set, joins live at $SERX_SCRATCH_DIR/<uuid-hex>
    # (stages/join.join_scratch_base) — the janitor must sweep THAT root,
    # and only dirs matching the 32-hex uuid4 nonce naming
    base = str(tmp_path / "scratch")
    os.makedirs(base, exist_ok=True)
    old = os.path.join(base, "a" * 32)
    new = os.path.join(base, "b" * 32)
    unrelated = os.path.join(base, "not-a-join-dir")
    for d in (old, new, unrelated):
        os.makedirs(os.path.join(d, "side0"))
        with open(os.path.join(d, "side0", "frag"), "wb") as f:
            f.write(b"x")
    _backdate(old)
    _backdate(unrelated)
    os.environ["SERX_SCRATCH_DIR"] = base
    try:
        removed = cleanup_orphan_scratch(base, min_age_s=3600)
    finally:
        del os.environ["SERX_SCRATCH_DIR"]
    assert old in removed and not os.path.exists(old)
    assert os.path.exists(new)           # fresh join possibly live


def test_join_sweep_root_matches_join_writer(tmp_path, monkeypatch):
    # janitor and _join_scratch must agree on the base in every config
    from search_engine_ray.stages.join import (_join_scratch,
                                               join_scratch_base)
    monkeypatch.setenv("SERX_SCRATCH_DIR", str(tmp_path / "s"))
    assert join_scratch_base() == str(tmp_path / "s")
    assert os.path.dirname(_join_scratch()) == str(tmp_path / "s")
    monkeypatch.delenv("SERX_SCRATCH_DIR")
    assert os.path.dirname(_join_scratch()) == join_scratch_base()


def test_owner_marker_written(tmp_path):
    idx, d = _mk_scratch(tmp_path, "marked_idx")
    with open(os.path.join(d, "OWNER.json")) as f:
        meta = json.load(f)
    assert meta["index_dir"] == os.path.abspath(idx)
    with open(os.path.join(idx, "_build_token")) as f:
        assert f.read().strip() == meta["token"]
