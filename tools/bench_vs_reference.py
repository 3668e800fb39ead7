"""Head-to-head single-node throughput: the REFERENCE BINARY vs this
engine, identical work, same machine.

The reference's published model (README.md:27-31) is one OS process
per partition via xargs/parallel, so the fair comparison has two
rows:

- 1 partition file  — the reference's per-process streaming loop vs
  our compat CLI (which pays Spark session startup; amortized to
  zero in a long-lived session, charged fully here — worst case);
- a 32-file glob    — the reference driven by xargs -P32 (its own
  documented parallelism recipe) vs ONE compat-CLI invocation
  (Spark schedules the glob across local[*] cores internally).

Workload: partition.map (deser → project one field → ser) over
ND-JSON, the reference's default codec and its canonical loop
(/root/reference/shmr/partition.py:114-132). Output row counts are
asserted equal before any time is reported.

Usage: python tools/bench_vs_reference.py [rows_per_file]
Prints one JSON line; recorded in BUILD_LOG.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF = "/root/reference"
SHIMS = os.path.join(REPO, "tests", "ref_shims")


def _env():
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join([SHIMS, REF, REPO])
    return env


def _make_inputs(d: str, n_files: int, rows_per_file: int) -> list[str]:
    paths = []
    for i in range(n_files):
        p = os.path.join(d, f"part.{i:02d}.json")
        with open(p, "w") as f:
            for j in range(rows_per_file):
                k = i * rows_per_file + j
                f.write(
                    '{"id": %d, "name": "user-%d", "age": %d, "tags": ["a", "b"]}\n'
                    % (k, k, k % 90)
                )
        paths.append(p)
    return paths


def _run_ref_one(inp: str, out: str) -> None:
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "shmr",
            "-i",
            inp,
            "partition.map",
            "--fn",
            "tests.cli_fixture_fns.get_id_field",
            "--outfile",
            out,
        ],
        env=_env(),
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])


def _run_ref_parallel(inputs: list[str], out_dir: str, procs: int) -> None:
    """The reference's own recipe: one process per partition,
    xargs-style (bounded concurrent subprocesses)."""
    running: list[subprocess.Popen] = []
    for i, inp in enumerate(inputs):
        out = os.path.join(out_dir, f"out.{i:02d}.json")
        p = subprocess.Popen(
            [
                sys.executable,
                "-m",
                "shmr",
                "-i",
                inp,
                "partition.map",
                "--fn",
                "tests.cli_fixture_fns.get_id_field",
                "--outfile",
                out,
            ],
            env=_env(),
            stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE,
            cwd=REPO,
        )
        running.append(p)
        while len([q for q in running if q.poll() is None]) >= procs:
            time.sleep(0.01)
    for p in running:
        p.wait()
        if p.returncode != 0:
            raise RuntimeError(p.stderr.read()[-2000:])


def _count_lines(path_or_glob_dir: str) -> int:
    import glob as g

    total = 0
    for p in sorted(g.glob(path_or_glob_dir)):
        with open(p) as f:
            total += sum(1 for _ in f)
    return total


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_files = 32
    work = tempfile.mkdtemp(prefix="shmr_h2h_")
    try:
        inputs = _make_inputs(work, n_files, rows)
        result = {"rows_per_file": rows, "n_files": n_files}

        # ---- single file ----
        ref_out = os.path.join(work, "ref_single.json")
        t0 = time.perf_counter()
        _run_ref_one(inputs[0], ref_out)
        result["ref_single_sec"] = round(time.perf_counter() - t0, 3)

        from shmr_spark.compat.cli import main as compat_main

        ours_out = os.path.join(work, "ours_single.json")
        t0 = time.perf_counter()
        compat_main(
            [
                "-i",
                inputs[0],
                "partition.map",
                "--fn",
                "tests.cli_fixture_fns.get_id_field",
                "--outfile",
                ours_out,
            ]
        )
        result["ours_single_sec_cold"] = round(time.perf_counter() - t0, 3)
        assert _count_lines(ref_out) == _count_lines(ours_out) == rows

        # warm: the session exists now — the steady-state number for
        # a long-lived pipeline process
        t0 = time.perf_counter()
        compat_main(
            [
                "-i",
                inputs[0],
                "partition.map",
                "--fn",
                "tests.cli_fixture_fns.get_id_field",
                "--outfile",
                ours_out,
            ]
        )
        result["ours_single_sec_warm"] = round(time.perf_counter() - t0, 3)

        # ---- 32-file glob ----
        ref_dir = os.path.join(work, "ref_glob")
        os.makedirs(ref_dir)
        t0 = time.perf_counter()
        _run_ref_parallel(inputs, ref_dir, procs=32)
        result["ref_glob32_xargs32_sec"] = round(time.perf_counter() - t0, 3)

        ours_dir = os.path.join(work, "ours_glob")
        os.makedirs(ours_dir)
        t0 = time.perf_counter()
        compat_main(
            [
                "-i",
                os.path.join(work, "part.*.json"),
                "partition.map",
                "--fn",
                "tests.cli_fixture_fns.get_id_field",
                "--outfile",
                os.path.join(ours_dir, "out.{auto}.json"),
            ]
        )
        result["ours_glob32_sec_warm"] = round(time.perf_counter() - t0, 3)
        n_ref = _count_lines(os.path.join(ref_dir, "out.*.json"))
        n_ours = _count_lines(os.path.join(ours_dir, "out.*.json"))
        assert n_ref == n_ours == rows * n_files, (n_ref, n_ours)

        # ---- the ENGINE's real tier: the same projection declared
        # natively (JVM json parse + columnar project, no Python in
        # the row loop). The opaque-fn compat tier above is the
        # documented escape hatch, not the engine path.
        from shmr_spark.session import get_spark

        spark = get_spark(app_name="h2h", shuffle_partitions=32)
        native_dir = os.path.join(work, "native_glob")
        t0 = time.perf_counter()
        (
            spark.read.schema("id long, name string, age long, tags array<string>")
            .json(os.path.join(work, "part.*.json"))
            .selectExpr("id", "age")
            .write.mode("overwrite")
            .json(native_dir)
        )
        result["native_glob32_sec_warm"] = round(time.perf_counter() - t0, 3)
        n_native = _count_lines(os.path.join(native_dir, "part-*"))
        assert n_native == rows * n_files, n_native

        result["speedup_glob_compat"] = round(
            result["ref_glob32_xargs32_sec"] / result["ours_glob32_sec_warm"], 2
        )
        result["speedup_glob_native"] = round(
            result["ref_glob32_xargs32_sec"] / result["native_glob32_sec_warm"], 2
        )
        result["speedup_single_warm"] = round(
            result["ref_single_sec"] / result["ours_single_sec_warm"], 2
        )

        # ---- a RELATIONAL workload: group-count over a
        # HIGH-CARDINALITY key (id % 100000 — partial aggregation
        # can't collapse it). The reference's own documented recipe
        # (README/SURVEY §2 #9) is THREE full passes, each
        # xargs-32-parallel here: (1) per-file reduce_by_key,
        # (2) split_by_key the partials into 32 aligned buckets,
        # (3) concat + reduce_by_key per bucket. The engine: ONE
        # groupBy (Catalyst's partial+final agg is the same algorithm
        # with the intermediate rewrite replaced by an in-memory
        # shuffle).
        def _xargs(cmds, procs=32):
            running = []
            for argv in cmds:
                p = subprocess.Popen(
                    [sys.executable, "-m", "shmr", *argv],
                    env=_env(), stdout=subprocess.DEVNULL,
                    stderr=subprocess.PIPE, cwd=REPO,
                )
                running.append(p)
                while len([q for q in running if q.poll() is None]) >= procs:
                    time.sleep(0.01)
            for p in running:
                p.wait()
                if p.returncode != 0:
                    raise RuntimeError(p.stderr.read()[-2000:])

        rbk = os.path.join(work, "ref_rbk")
        spl = os.path.join(work, "ref_split")
        cat = os.path.join(work, "ref_cat")
        fin = os.path.join(work, "ref_final")
        for d in (rbk, spl, cat, fin):
            os.makedirs(d)
        t0 = time.perf_counter()
        _xargs([
            ["-i", inp, "partition.reduce_by_key",
             "--key_fn", "tests.cli_fixture_fns.id_mod100k",
             "--fn", "tests.cli_fixture_fns.count_by_id_mod",
             "--outfile", os.path.join(rbk, f"rbk.{i:02d}.json")]
            for i, inp in enumerate(inputs)
        ])
        _xargs([
            ["-i", os.path.join(rbk, f"rbk.{i:02d}.json"),
             "partition.split_by_key",
             "--key_fn", "tests.cli_fixture_fns.key_of_k",
             "--num_partitions", "32",
             "--outfile", os.path.join(spl, f"in{i:02d}." + "{auto}.json")]
            for i in range(n_files)
        ])
        _xargs([
            ["-i", os.path.join(spl, f"*.{b:05d}.json"), "partitions.concat",
             "--outfile", os.path.join(cat, f"bucket.{b:05d}.json")]
            for b in range(32)
        ])
        _xargs([
            ["-i", os.path.join(cat, f"bucket.{b:05d}.json"),
             "partition.reduce_by_key",
             "--key_fn", "tests.cli_fixture_fns.key_of_k",
             "--fn", "tests.cli_fixture_fns.merge_counts",
             "--outfile", os.path.join(fin, f"out.{b:05d}.json")]
            for b in range(32)
        ])
        result["ref_groupcount_full_sec"] = round(time.perf_counter() - t0, 3)

        # WARM (steady-state) reference time: min of 2 repeats over the
        # now-hot page cache — the long-lived-session comparison. Each
        # repeat rewrites all intermediates (that IS the reference's
        # model; there is nothing else to warm on its side).
        ref_warm = result["ref_groupcount_full_sec"]
        for _ in range(2):
            for d in (rbk, spl, cat, fin):
                shutil.rmtree(d); os.makedirs(d)
            t0 = time.perf_counter()
            _xargs([
                ["-i", inp, "partition.reduce_by_key",
                 "--key_fn", "tests.cli_fixture_fns.id_mod100k",
                 "--fn", "tests.cli_fixture_fns.count_by_id_mod",
                 "--outfile", os.path.join(rbk, f"rbk.{i:02d}.json")]
                for i, inp in enumerate(inputs)
            ])
            _xargs([
                ["-i", os.path.join(rbk, f"rbk.{i:02d}.json"),
                 "partition.split_by_key",
                 "--key_fn", "tests.cli_fixture_fns.key_of_k",
                 "--num_partitions", "32",
                 "--outfile", os.path.join(spl, f"in{i:02d}." + "{auto}.json")]
                for i in range(n_files)
            ])
            _xargs([
                ["-i", os.path.join(spl, f"*.{b:05d}.json"), "partitions.concat",
                 "--outfile", os.path.join(cat, f"bucket.{b:05d}.json")]
                for b in range(32)
            ])
            _xargs([
                ["-i", os.path.join(cat, f"bucket.{b:05d}.json"),
                 "partition.reduce_by_key",
                 "--key_fn", "tests.cli_fixture_fns.key_of_k",
                 "--fn", "tests.cli_fixture_fns.merge_counts",
                 "--outfile", os.path.join(fin, f"out.{b:05d}.json")]
                for b in range(32)
            ])
            ref_warm = min(ref_warm, round(time.perf_counter() - t0, 3))
        result["ref_groupcount_warm_sec"] = ref_warm

        out_rel = os.path.join(work, "native_groupcount")

        def _native_groupcount():
            (
                spark.read.schema(
                    "id long, name string, age long, tags array<string>"
                )
                .json(os.path.join(work, "part.*.json"))
                .selectExpr("id % 100000 AS k")
                .groupBy("k")
                .count()
                .write.mode("overwrite")
                .json(out_rel)
            )

        # COLD: one shot, charged with file listing + codegen compile —
        # the reference's "one-off job" framing
        t0 = time.perf_counter()
        _native_groupcount()
        result["native_groupcount_full_sec"] = round(time.perf_counter() - t0, 3)
        # WARM: min of 2 repeats (plan cache + JIT hot) — the
        # long-lived-session framing
        nat_warm = result["native_groupcount_full_sec"]
        for _ in range(2):
            t0 = time.perf_counter()
            _native_groupcount()
            nat_warm = min(nat_warm, round(time.perf_counter() - t0, 3))
        result["native_groupcount_warm_sec"] = nat_warm

        n_groups_ref = _count_lines(os.path.join(fin, "out.*.json"))
        n_groups_native = _count_lines(os.path.join(out_rel, "part-*"))
        expected_groups = min(100000, rows * n_files)
        assert n_groups_ref == n_groups_native == expected_groups, (
            n_groups_ref, n_groups_native,
        )
        result["speedup_groupcount"] = round(
            result["ref_groupcount_full_sec"]
            / result["native_groupcount_full_sec"],
            2,
        )
        result["speedup_groupcount_warm"] = round(
            result["ref_groupcount_warm_sec"]
            / result["native_groupcount_warm_sec"],
            2,
        )
        print(json.dumps(result))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
