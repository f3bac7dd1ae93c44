"""ASCII-only corpus invariant (ADVICE r4).

The character-level text oracles in ``__ray_entry__`` (shingle CTE, CDC
rolling hash, poly257 base hash, span-sequence fold) hash DuckDB
codepoints at character offsets while the engine hashes UTF-8 bytes at
byte offsets — exact agreement requires every text column to be pure
ASCII (byte == codepoint).  This test pins that invariant for every
corpus the driver compares on, so a corpus regeneration that introduces
non-ASCII text fails HERE with a clear message instead of as an opaque
value-hash mismatch.
"""

import glob
import os

import duckdb
import pytest

_SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_documents_are_pure_ascii(sf_dir):
    path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip(f"no documents table in {sf_dir}")
    con = duckdb.connect()
    n_bad, n_ctl = con.execute(
        f"""
        SELECT SUM(CASE WHEN strlen(text) <> length(text)
                   THEN 1 ELSE 0 END),
               SUM(CASE WHEN regexp_matches(text, '[^\\x00-\\x7F]')
                   THEN 1 ELSE 0 END)
        FROM read_parquet('{path}')
        """
    ).fetchone()
    assert not n_bad and not n_ctl, (
        f"{path}: {n_bad} docs with multi-byte codepoints / {n_ctl} with "
        "non-ASCII chars — the character-level SQL oracles "
        "(__ray_entry__: shingle/CDC/poly257/span-fold) are only exact "
        "over pure-ASCII text; switch them to byte addressing first"
    )


def test_synth_geo_documents_are_pure_ascii():
    """The synthetic geo corpus's span text feeds the span-sequence
    invariant oracle — same byte==codepoint requirement."""
    from osm_data_3d_tiles_ray.synth.generator import ensure_synth

    root = ensure_synth(0.001)
    con = duckdb.connect()
    (n_bad,) = con.execute(
        f"""
        SELECT COALESCE(SUM(CASE WHEN strlen(s.text) <> length(s.text)
                        THEN 1 ELSE 0 END), 0)
        FROM (SELECT unnest(spans) AS s
              FROM read_parquet('{root}/documents/*.parquet'))
        """
    ).fetchone()
    assert n_bad == 0
