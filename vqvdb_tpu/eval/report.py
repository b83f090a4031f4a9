"""Visual evaluation report — the reference notebooks' plots as files.

Renders the acceptance plots of notebook_scalar.ipynb / notebook_vec3f.ipynb
(per-block PSNR and MSE histograms, codebook usage histogram + dead codes,
mid-slice montage of original vs reconstruction vs |error|) into a directory
of PNGs plus a markdown summary, from the same evaluate_codec/codebook_report
data the CLI emits as JSON.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Union

import numpy as np


def write_report(
    out_dir: Union[str, Path],
    report: Dict,
    codebook: Dict,
    *,
    sample_leaves: Optional[np.ndarray] = None,
    sample_recon: Optional[np.ndarray] = None,
    title: str = "vqvdb_tpu evaluation",
) -> Path:
    """Write PNG plots + report.md into out_dir; returns the md path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    # --- PSNR / MSE distributions (ref: notebook_scalar cells 2-4) -------
    psnr = report["per_block_psnr"]
    finite = psnr[np.isfinite(psnr)]
    fig, axes = plt.subplots(1, 2, figsize=(10, 3.5))
    axes[0].hist(finite, bins=60, color="#4878d0")
    axes[0].set(title="Per-block PSNR (dB)", xlabel="dB", ylabel="blocks")
    axes[1].hist(np.log10(np.maximum(report["per_block_mse"], 1e-12)),
                 bins=60, color="#ee854a")
    axes[1].set(title="Per-block log10(MSE)", xlabel="log10 MSE")
    fig.tight_layout()
    fig.savefig(out / "psnr_mse_hist.png", dpi=110)
    plt.close(fig)

    # --- Codebook usage (ref: notebook_vec3f usage/dead-code cells) ------
    counts = codebook["counts"]
    fig, ax = plt.subplots(figsize=(10, 3))
    order = np.argsort(counts)[::-1]
    ax.bar(np.arange(len(counts)), counts[order], width=1.0, color="#6acc64")
    ax.set(title=f"Codebook usage (sorted) — {codebook['active_codes']} active, "
                 f"{codebook['dead_codes']} dead, ppl {codebook['perplexity']:.1f}",
           xlabel="code (sorted by usage)", ylabel="assignments")
    fig.tight_layout()
    fig.savefig(out / "codebook_usage.png", dpi=110)
    plt.close(fig)

    # --- Mid-slice montage (ref: notebook_vec3f montage cells) -----------
    if sample_leaves is not None and sample_recon is not None:
        k = min(6, sample_leaves.shape[0])
        fig, axes = plt.subplots(3, k, figsize=(2.0 * k, 6))
        for i in range(k):
            orig = sample_leaves[i][..., 0]
            rec = sample_recon[i][..., 0]
            for row, (img, label) in enumerate(
                [(orig, "original"), (rec, "recon"),
                 (np.abs(orig - rec), "|error|")]):
                ax = axes[row, i] if k > 1 else axes[row]
                ax.imshow(img[:, :, img.shape[2] // 2], cmap="magma")
                ax.set_axis_off()
                if i == 0:
                    ax.set_title(label, loc="left", fontsize=9)
        fig.tight_layout()
        fig.savefig(out / "montage.png", dpi=110)
        plt.close(fig)

    md = out / "report.md"
    lines = [
        f"# {title}",
        "",
        f"- blocks evaluated: **{report['num_blocks']}**",
        f"- MSE: **{report['mse']:.3e}**  (zero-voxel {report['zero_voxel_mse']:.3e}"
        f" / non-zero {report['nonzero_voxel_mse']:.3e})",
        f"- PSNR: mean **{report['psnr_mean']:.2f} dB**, p5 "
        f"{report['psnr_p5']:.2f}, median {report['psnr_p50']:.2f}",
        f"- codebook: {codebook['active_codes']} active / "
        f"{codebook['dead_codes']} dead, perplexity {codebook['perplexity']:.1f}",
        "",
        "![](psnr_mse_hist.png)",
        "![](codebook_usage.png)",
    ]
    if (out / "montage.png").exists():
        lines.append("![](montage.png)")
    md.write_text("\n".join(lines) + "\n")
    return md
