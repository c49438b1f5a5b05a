"""Plot sinks (SURVEY.md §2.1 S5) — the reference's terminal output.

The reference ends each analysis in matplotlib: a line chart of the
lifetime rate curve (analyse.py:109-135), a dual-axis bar+line
time-of-day chart (analyse.py:303-351), and a horizontal bar city
ranking (analyse.py:501-513). The engine's contract ends at the small
aggregate DataFrame; these sinks collect it (**only** ≤ a few hundred
rows ever reach the driver) and render the same three figures.

matplotlib is not installed in this environment, so the import is gated:
each function raises a clear error when the backend is missing and is
exercised in tests via a stub module. The *collect discipline* — assert
the frame is small before ``toPandas`` — is the engine-level behavior
under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MAX_PLOT_ROWS = 10_000  # a plot sink is a driver-side sink; refuse big frames


def _matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg")  # headless
        import matplotlib.pyplot as plt

        return plt
    except ImportError as exc:  # pragma: no cover - exercised via stub in tests
        raise RuntimeError(
            "matplotlib is not installed; install it to render plot sinks "
            "(the engine's query contract ends at the small result DataFrame)"
        ) from exc


def _small_pandas(df: DataFrame, expected_cols: list[str]):
    missing = [c for c in expected_cols if c not in df.columns]
    if missing:
        raise ValueError(f"plot sink missing columns: {missing}")
    pdf = df.limit(MAX_PLOT_ROWS + 1).toPandas()
    if len(pdf) > MAX_PLOT_ROWS:
        raise ValueError(
            f"plot sink refused: > {MAX_PLOT_ROWS} rows reached the driver; "
            "aggregate further before plotting"
        )
    return pdf


def plot_rate_curve(df: DataFrame, out_path: str, x: str = "bin", y: str = "smoothed_rate") -> str:
    """Line chart of a smoothed rate curve (analyse.py:109-135 shape)."""
    pdf = _small_pandas(df, [x, y])
    plt = _matplotlib()
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.plot(pdf[x], pdf[y])
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def plot_dual_axis(
    df: DataFrame, out_path: str, x: str, bars: str, line: str
) -> str:
    """Dual-axis bar+line chart (analyse.py:303-351 shape)."""
    pdf = _small_pandas(df, [x, bars, line])
    plt = _matplotlib()
    fig, ax1 = plt.subplots(figsize=(12, 5))
    ax1.bar(range(len(pdf)), pdf[bars])
    ax2 = ax1.twinx()
    ax2.plot(range(len(pdf)), pdf[line], color="C1")
    ax1.set_xlabel(x)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def plot_ranking_barh(df: DataFrame, out_path: str, label: str, value: str) -> str:
    """Horizontal-bar ranking chart (analyse.py:501-513 shape)."""
    pdf = _small_pandas(df, [label, value])
    plt = _matplotlib()
    fig, ax = plt.subplots(figsize=(8, max(3, 0.3 * len(pdf))))
    ax.barh(pdf[label], pdf[value])
    ax.set_xlabel(value)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
