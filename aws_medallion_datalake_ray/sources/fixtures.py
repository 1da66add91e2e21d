"""Deterministic synthetic source-code table (FIXTURES.md §1), seed-stable.

Generates the engine's canonical input: a Parquet table
``(repo, path, commit, lang, content)`` where

- ``repo`` is Zipf(s=1.2)-skewed (hot repos exercise salted MERGE/groupby),
- each (repo, path) has 1–5 commit versions,
- ``content`` is pseudo-code text with log-normal length, **uniquely
  determined by (repo, path, commit)** so ``sha256(content)`` is reproducible
  across runs — the per-row verification invariant.

Written deliberately as many small files so compaction has real work.
No external data; everything derives from the seed.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from aws_medallion_datalake_ray.schema import LANGS, SOURCE_FILES_SCHEMA

_EXT = {
    "py": ".py", "rs": ".rs", "go": ".go", "js": ".js", "ts": ".ts",
    "java": ".java", "c": ".c", "cpp": ".cpp", "md": ".md", "toml": ".toml",
}
_LANG_P = np.array([0.22, 0.08, 0.08, 0.14, 0.10, 0.10, 0.07, 0.07, 0.10, 0.04])

# a fixed pool of pseudo-code lines; content = unique header + pool slice
_POOL = [
    f"let v{i} = compute({i % 97}, buf[{i % 31}]) + offset_{i % 13};" for i in range(997)
]


def _grouped_arange(counts: np.ndarray) -> np.ndarray:
    """[3,2] -> [0,1,2,0,1] (vectorized within-group counter)."""
    n = counts.sum()
    idx = np.arange(n)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    return idx - starts


def make_source_files(n_rows: int, seed: int = 42, pair_offset: int = 0) -> pa.Table:
    """``pair_offset`` shifts path ids so chunked generation (different seeds)
    never repeats a (repo, path) pair across chunks."""
    rng = np.random.default_rng(seed)

    # (repo, path) pairs, each with 1-5 versions
    n_pairs = max(4, int(n_rows / 1.8))
    versions = rng.integers(1, 6, n_pairs)
    cum = np.cumsum(versions)
    # clamp: if the drawn versions sum below n_rows (possible for small
    # n_rows), searchsorted lands past the end — keep every pair and let
    # the last-pair adjustment below absorb the shortfall
    n_pairs = min(int(np.searchsorted(cum, n_rows, side="left")) + 1,
                  len(versions))
    versions = versions[:n_pairs]
    versions[-1] = max(1, versions[-1] - (int(versions.sum()) - n_rows))

    n_repos = max(4, n_pairs // 40)
    ranks = np.arange(1, n_repos + 1, dtype=float)
    p = ranks ** -1.2
    p /= p.sum()
    repo_idx = rng.choice(n_repos, n_pairs, p=p)

    lang_idx = rng.integers(0, len(LANGS), n_pairs)
    lang_idx = rng.choice(len(LANGS), n_pairs, p=_LANG_P)
    d1 = rng.integers(0, 8, n_pairs)
    d2 = rng.integers(0, 12, n_pairs)
    file_k = np.arange(n_pairs) + pair_offset

    pair_repo = [f"org{i // 50}/repo{i}" for i in repo_idx]
    pair_lang = [LANGS[i] for i in lang_idx]
    pair_path = [
        f"src/m{a}/sub{b}/file_{k}{_EXT[lg]}"
        for a, b, k, lg in zip(d1, d2, file_k, pair_lang)
    ]

    row_pair = np.repeat(np.arange(n_pairs), versions)
    row_ver = _grouped_arange(versions)
    n = len(row_pair)

    # log-normal content length in pool lines (median ~12 lines ~ 700 B)
    n_lines = np.clip(rng.lognormal(2.5, 0.9, n).astype(int), 1, 400)

    repos, paths, commits, langs, contents = [], [], [], [], []
    pool, pool_n = _POOL, len(_POOL)
    for i in range(n):
        pid = row_pair[i]
        r, pth, lg = pair_repo[pid], pair_path[pid], pair_lang[pid]
        v = int(row_ver[i])
        c = hashlib.sha1(f"{r}/{pth}/{v}".encode()).hexdigest()
        start = int(c[:8], 16) % pool_n
        k = int(n_lines[i])
        body = "\n".join(pool[(start + j) % pool_n] for j in range(k))
        repos.append(r)
        paths.append(pth)
        commits.append(c)
        langs.append(lg)
        contents.append(f"// {r}/{pth}@{c} v{v}\n{body}\n")

    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        },
        schema=SOURCE_FILES_SCHEMA,
    )


def make_updates(base: pa.Table, n_updates: int, seed: int = 43) -> pa.Table:
    """MERGE right side (FIXTURES.md §1b): ~60% same (repo,path) with a NEW
    commit/content, ~30% brand-new paths, ~10% exact duplicates (idempotent
    no-ops). Skew mirrors the base because rows are sampled from it."""
    rng = np.random.default_rng(seed)
    n_upd = int(n_updates * 0.6)
    n_new = int(n_updates * 0.3)
    n_dup = n_updates - n_upd - n_new

    idx = rng.choice(len(base), n_upd + n_dup, replace=False)
    picked = base.take(pa.array(idx))
    repos = picked["repo"].to_pylist()
    paths = picked["path"].to_pylist()
    langs = picked["lang"].to_pylist()

    out = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    pool, pool_n = _POOL, len(_POOL)

    def emit(r, pth, lg, version_tag):
        c = hashlib.sha1(f"{r}/{pth}/{version_tag}".encode()).hexdigest()
        start = int(c[:8], 16) % pool_n
        k = 4 + int(c[8:10], 16) % 24
        body = "\n".join(pool[(start + j) % pool_n] for j in range(k))
        out["repo"].append(r)
        out["path"].append(pth)
        out["commit"].append(c)
        out["lang"].append(lg)
        out["content"].append(f"// {r}/{pth}@{c} {version_tag}\n{body}\n")

    for i in range(n_upd):  # same (repo,path), new commit+content
        emit(repos[i], paths[i], langs[i], "upd9")
    for j in range(n_new):  # brand-new paths in existing repos
        r = repos[j % max(1, n_upd)] if n_upd else "org0/repo0"
        lg = langs[j % max(1, n_upd)] if n_upd else "py"
        emit(r, f"src/newmod/gen_{seed}_{j}{_EXT[lg]}", lg, "v0")
    dup = picked.slice(n_upd, n_dup)  # exact duplicates of existing rows
    for col in out:
        out[col].extend(dup[col].to_pylist())

    t = pa.table({k: pa.array(v, SOURCE_FILES_SCHEMA.field(k).type) for k, v in out.items()})
    perm = rng.permutation(len(t))
    return t.take(pa.array(perm))


def write_source_files(
    out_dir: str, n_rows: int, rows_per_file: int = 2000, seed: int = 42,
    chunk_rows: int = 100_000,
) -> list[str]:
    """Write the fixture as many small parquet files; returns file paths.

    Streams generation in ``chunk_rows`` chunks (bounded driver memory at
    million-row bench scales); deterministic via per-chunk seeds + pair
    offsets.  Idempotent: a completion marker skips regeneration.
    """
    marker = os.path.join(out_dir, f".complete-{n_rows}-{rows_per_file}-{seed}")
    if os.path.exists(marker):
        return sorted(
            os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
        )
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.endswith(".parquet") or f.startswith(".complete-"):
            os.unlink(os.path.join(out_dir, f))
    paths = []
    file_i = 0
    done = 0
    chunk_i = 0
    while done < n_rows:
        n = min(chunk_rows, n_rows - done)
        t = make_source_files(n, seed + chunk_i, pair_offset=chunk_i * 10_000_000)
        for i in range(0, len(t), rows_per_file):
            p = os.path.join(out_dir, f"part-{file_i:05d}.parquet")
            pq.write_table(t.slice(i, rows_per_file), p, compression="snappy")
            paths.append(p)
            file_i += 1
        done += len(t)
        chunk_i += 1
    open(marker, "w").close()
    return paths
