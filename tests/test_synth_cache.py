"""corpus_dir_for cache validation: a _COMPLETE marker alone must not be
trusted — a partially cleaned directory (e.g. a checkout that restored
only some tables) has to regenerate (SURVEY.md §7 determinism notes)."""

import os
import shutil

from don_crawler_spark.sources.synth import (
    CORPUS_TABLES,
    _corpus_complete,
    corpus_dir_for,
)


def test_generate_then_cache_hit(tmp_path):
    base = str(tmp_path)
    out = corpus_dir_for(base, n_pages=50)
    assert _corpus_complete(out)
    mtime = os.path.getmtime(os.path.join(out, "seeds.parquet"))
    # second call must be a pure cache hit (no rewrite)
    assert corpus_dir_for(base, n_pages=50) == out
    assert os.path.getmtime(os.path.join(out, "seeds.parquet")) == mtime


def test_partial_cleanup_regenerates(tmp_path):
    base = str(tmp_path)
    out = corpus_dir_for(base, n_pages=50)
    shutil.rmtree(os.path.join(out, "pages.parquet"))
    os.remove(os.path.join(out, "transient.parquet"))
    assert not _corpus_complete(out)
    out2 = corpus_dir_for(base, n_pages=50)
    assert out2 == out
    for t in CORPUS_TABLES:
        assert os.path.exists(os.path.join(out, t)), t
    assert _corpus_complete(out)


def test_empty_pages_dir_regenerates(tmp_path):
    base = str(tmp_path)
    out = corpus_dir_for(base, n_pages=50)
    pages = os.path.join(out, "pages.parquet")
    shutil.rmtree(pages)
    os.makedirs(pages)  # directory exists but holds no files
    assert not _corpus_complete(out)
    corpus_dir_for(base, n_pages=50)
    assert os.listdir(pages)
