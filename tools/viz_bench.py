"""Benchmark visualization (SURVEY.md §2 #36 — the reference's viz_benchmark.py
re-expressed for our TSV schema). Reads ``benchmark_results.tsv`` (written by
tools/reference_bench.py), derives throughput columns, and renders line plots
per filter family across parallelism levels. Seaborn/matplotlib are optional —
without them the tool prints the summary table only (this container has neither).

Usage: python tools/viz_bench.py [tsv_path] [--out-dir DIR]
"""

from __future__ import annotations

import argparse

import pandas as pd


def load_data(path: str) -> pd.DataFrame:
    df = pd.read_csv(path, sep="\t")
    # derived throughputs (viz_benchmark.py:92-127 semantics): M ops/sec
    df["insert_throughput_m"] = df["insert_count"] / df["insert_ms"] * 1000 / 1e6
    df["query_throughput_m"] = df["test_count"] / df["contains_ms"] * 1000 / 1e6
    return df


def summarize(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.groupby("filter")[
            ["insert_throughput_m", "query_throughput_m", "fp_rate", "fn_rate", "bits_per_item"]
        ]
        .agg(["mean", "std"])
        .round(4)
    )


def plot(df: pd.DataFrame, out_dir: str) -> list[str]:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return []
    import os

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for metric, fname, logy in [
        ("insert_throughput_m", "insert_throughput.png", False),
        ("query_throughput_m", "query_throughput.png", False),
        ("fp_rate", "fp_rate.png", True),
        ("total_bits", "total_bits.png", False),
    ]:
        fig, ax = plt.subplots(figsize=(8, 5))
        for name, grp in df.groupby("filter"):
            g = grp.sort_values("threads")
            ax.plot(g["threads"], g[metric], marker="o", label=name)
        ax.set_xlabel("parallelism (num_cpus)")
        ax.set_ylabel(metric)
        if logy:
            ax.set_yscale("log")
        ax.legend()
        path = f"{out_dir}/{fname}"
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tsv", nargs="?", default="/tmp/raysketch_bench/benchmark_results.tsv")
    ap.add_argument("--out-dir", default="/tmp/raysketch_bench/plots")
    args = ap.parse_args()
    df = load_data(args.tsv)
    print(summarize(df).to_string())
    written = plot(df, args.out_dir)
    if written:
        print("plots:", *written, sep="\n  ")
    else:
        print("(matplotlib not installed — summary only)")


if __name__ == "__main__":
    main()
