"""Driver-visible address-extraction pipeline (surfaces M6/M7).

The scalar extractors (``functions/extract.py`` — behavioral analogs of
the reference's ZIP / city / state parsers, ``dedupe_logic/
processor.py:344-365``) were library-only in round 2; this module exposes
them as an oracle-checked ``queries()`` entry over a deterministic
address fixture, the same fixture pattern as ``multimodal.py``: one
cached parquet whose path both the Ray query and the DuckDB oracle SQL
reference.

The fixture plants every edge case the extractors guard against —
mid-array nulls (the ADVICE r2 NaN-offset bug), empty strings, <3-part
addresses, ZIP+4 tails, digit-leading city parts, lowercase state codes,
and >3-part addresses — so the oracle comparison pins the full parsing
contract, not just the happy path.
"""

from __future__ import annotations

import os

import pyarrow as pa

from fuzzy_dedupe_pipeline_ray.functions.extract import (
    extract_city_state_arrays,
    extract_zip_array,
)

#: deterministic component pools for the synthetic addresses
_STREETS = ["123 Main St", "500 Oak Ave", "77 Pine Rd", "9 Elm Blvd",
            "2500 Cedar Ln", "41 Birch Way", "880 Maple Dr", "6 Walnut Ct"]
_CITIES = ["Springfield", "Portland", "Riverton", "Fairview", "Ashland",
           "Georgetown", "Clinton", "Salem"]
_STATES = ["IL", "OR", "TX", "NY", "CA", "WA", "OH", "GA"]
_ZIPS = ["62704", "97205", "75001", "10001", "94016", "98101", "43004",
         "30301"]

ADDR_FIXTURE_N = 240
ADDR_FIXTURE_VERSION = "v1"


def synth_addr_table(n: int = ADDR_FIXTURE_N) -> pa.Table:
    """Deterministic synthetic address table. Layout cycles through 10
    shapes (index mod 10) so every extractor branch appears many times:

      0-3  full 'Street, City, ST ZIP'            (happy path)
      4    ZIP+4 tail                              (zip keeps 5 digits)
      5    two comma parts                         (not city/state eligible)
      6    no ZIP                                  (zip null)
      7    digit-leading city part                 (city null)
      8    lowercase state + 4 comma parts         (state null, city parses)
      9    null / empty, alternating               (everything null)
    """
    ids, addrs = [], []
    for i in range(n):
        s = _STREETS[i % len(_STREETS)]
        c = _CITIES[(i * 3 + 1) % len(_CITIES)]
        st = _STATES[(i * 5 + 2) % len(_STATES)]
        z = _ZIPS[(i * 7 + 3) % len(_ZIPS)]
        shape = i % 10
        if shape <= 3:
            a = f"{s}, {c}, {st} {z}"
        elif shape == 4:
            a = f"{s}, {c}, {st} {z}-{1000 + i % 9000:04d}"
        elif shape == 5:
            a = f"{c}, {st} {z}"
        elif shape == 6:
            a = f"{s}, {c}, {st}"
        elif shape == 7:
            a = f"{s}, {i % 9 + 1}th Ward, {st} {z}"
        elif shape == 8:
            a = f"Apt {i % 50}, {s}, {c}, {st.lower()} {z}"
        else:
            a = None if (i // 10) % 2 == 0 else ""
        ids.append(i)
        addrs.append(a)
    return pa.table({"addr_id": pa.array(ids, pa.int64()),
                     "addr": pa.array(addrs, pa.string())})


def addr_fixture_path(root: str = "/tmp/fdpr_addr") -> str:
    """Generate-and-cache the deterministic address parquet; returns the
    file path (stable across runs — the oracle SQL references it)."""
    import pyarrow.parquet as pq

    d = os.path.join(root, f"{ADDR_FIXTURE_VERSION}_{ADDR_FIXTURE_N}")
    path = os.path.join(d, "addresses.parquet")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(d, exist_ok=True)
    pq.write_table(synth_addr_table(), path, row_group_size=64)
    with open(done, "w") as f:
        f.write(ADDR_FIXTURE_VERSION)
    return path


def addr_extract(sf_dir: str):
    """Driver-visible M6/M7 pipeline: ZIP / city / state extraction over
    the deterministic address fixture (``sf_dir`` unused — addresses are
    not derived from the sf tables). Pure ``pyarrow.compute`` RE2 kernels
    inside ``map_batches``; compared against a DuckDB ``regexp_extract``
    oracle on the same parquet."""
    import ray.data

    def extract(b: pa.Table) -> pa.Table:
        addr = b.column("addr")
        city, state = extract_city_state_arrays(addr)
        return pa.table({"addr_id": b.column("addr_id"),
                         "zip": extract_zip_array(addr),
                         "city": city,
                         "state": state})

    return (ray.data.read_parquet(addr_fixture_path())
            .map_batches(extract, batch_format="pyarrow",
                         zero_copy_batch=True)
            .sort("addr_id"))


def addr_extract_oracle_sql() -> str:
    """DuckDB-RE2 equivalent of ``addr_extract`` over the same fixture
    parquet; mirrors functions/extract.py branch-for-branch (eligibility
    = ≥3 comma parts; city = trimmed parts[-2] with no digit in its first
    3 chars; state = first word-bounded 2-uppercase token of parts[-1])."""
    path = addr_fixture_path()
    return f"""
        WITH p AS (
            SELECT addr_id, addr, string_split(addr, ',') AS parts
            FROM read_parquet('{path}')),
        e AS (
            SELECT addr_id, addr,
                   len(parts) >= 3 AS eligible,
                   trim(parts[-2]) AS city_raw,
                   trim(parts[-1]) AS last_part
            FROM p)
        SELECT addr_id,
               nullif(regexp_extract(addr,
                      '\\b(\\d{{5}})(?:-\\d{{4}})?\\b', 1), '') AS zip,
               CASE WHEN eligible AND length(city_raw) > 0
                         AND NOT regexp_matches(substr(city_raw, 1, 3),
                                                '[0-9]')
                    THEN city_raw END AS city,
               CASE WHEN eligible
                    THEN nullif(regexp_extract(last_part,
                                '\\b([A-Z][A-Z])\\b', 1), '') END AS state
        FROM e ORDER BY addr_id
    """
