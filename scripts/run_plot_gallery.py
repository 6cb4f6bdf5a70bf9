#!/usr/bin/env python
"""Render the plot gallery: one figure per major plot type, written to an
output directory. Doubles as an acceptance test of the plotting layer
(role of the reference's scripts/run_plot_gallery.py notebook runner)."""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import matplotlib

matplotlib.use("Agg")

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir", nargs="?", default="gallery_output")
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    import getdist_tpu.chains as tchains

    tchains.print_load_details = False
    from getdist_tpu import plots
    from getdist_tpu.gaussian_mixtures import GaussianND, Mixture2D, randomTestMCSamples

    samples1, samples2 = randomTestMCSamples(ndim=4, nMCSamples=2)
    bimodal = Mixture2D([[-1, 0], [1, 0]], [(2 / 3, 2 / 3, 0), (2 / 3, 2 / 3, 0)]).MCSamples(
        8000, logLikes=True, random_state=10, names=["x", "y"], labels=["x", "y"]
    )

    made = []

    def export(g, name):
        path = os.path.join(args.out_dir, name)
        g.export(path)
        made.append(name)
        print("wrote", path)

    g = plots.get_single_plotter(width_inch=4, auto_close=True)
    g.plot_1d([samples1, samples2], "x0", marker=0)
    export(g, "plot_1d.png")

    g = plots.get_single_plotter(width_inch=4, auto_close=True)
    g.plot_2d([samples1, samples2], "x1", "x2", filled=True)
    export(g, "plot_2d_filled.png")

    g = plots.get_subplot_plotter(auto_close=True)
    g.triangle_plot([samples1, samples2], ["x0", "x1", "x2"], filled=True, legend_labels=["Sim 1", "Sim 2"])
    export(g, "triangle.png")

    g = plots.get_subplot_plotter(auto_close=True)
    g.triangle_plot([samples1], ["x0", "x1", "x2"], upper_roots=[samples2], filled=True)
    export(g, "triangle_upper.png")

    g = plots.get_subplot_plotter(auto_close=True)
    g.plots_1d([samples1, samples2], ["x0", "x1", "x2", "x3"], nx=4)
    export(g, "plots_1d_grid.png")

    g = plots.get_subplot_plotter(auto_close=True)
    g.rectangle_plot(["x0", "x1"], ["x2", "x3"], roots=[samples1, samples2], filled=True)
    export(g, "rectangle.png")

    g = plots.get_single_plotter(width_inch=5, auto_close=True)
    g.plot_3d(samples1, ["x0", "x1", "x2"])
    export(g, "scatter_3d.png")

    g = plots.get_single_plotter(width_inch=5, auto_close=True)
    g.plot_4d(samples1, ["x0", "x1", "x2", "x3"], color_bar=False, alpha=0.3)
    export(g, "scatter_4d.png")

    g = plots.get_single_plotter(width_inch=4, auto_close=True)
    g.plot_2d(bimodal, "x", "y", shaded=True)
    export(g, "shaded_2d.png")

    # analytic mixture overlay (Fisher-style)
    gauss = GaussianND([0.0, 0.0, 0.0, 0.0], np.eye(4) * 0.8, names=["x0", "x1", "x2", "x3"])
    g = plots.get_single_plotter(width_inch=4, auto_close=True)
    g.plot_2d([samples1, gauss], "x0", "x1", filled=[True, False])
    export(g, "mixture_overlay.png")

    g = plots.get_subplot_plotter(auto_close=True)
    g.plots_2d([samples1, samples2], param_pairs=[["x0", "x1"], ["x1", "x2"], ["x2", "x3"]], nx=3, filled=True)
    export(g, "plots_2d_grid.png")

    g = plots.get_subplot_plotter(auto_close=True)
    g.plots_2d_triplets(
        [(samples1, "x0", "x1"), (samples2, "x1", "x2"), (samples1, "x2", "x3")], nx=3, filled=True
    )
    export(g, "plots_2d_triplets.png")

    g = plots.get_subplot_plotter(auto_close=True)
    g.plots_3d([samples1, samples2], [["x0", "x1", "x2"], ["x1", "x2", "x3"]], nx=2)
    export(g, "plots_3d_grid.png")

    g = plots.get_single_plotter(width_inch=4, auto_close=True)
    g.plot_2d(samples1, "x0", "x1")
    g.add_2d_covariance(
        [samples1.mean("x0"), samples1.mean("x1")], samples1.cov(["x0", "x1"]), ls="--", color="crimson"
    )
    g.add_x_marker(0, ls=":")
    g.add_y_marker(0, ls=":")
    g.add_x_bands(0, 0.5)
    g.add_text("covariance ellipse", x=0.05, y=0.9)
    export(g, "covariance_markers.png")

    g = plots.get_single_plotter(width_inch=4, auto_close=True)
    g.plot_1d([samples1, samples2], "x0", normalized=True)
    g.add_legend(["Sim 1", "Sim 2"], colored_text=True)
    export(g, "normalized_colored_legend.png")

    from getdist_tpu.styles import planck, tab10  # noqa: F401  (registers the styles)

    # the planck style sets text.usetex (like the reference's) and needs a
    # latex binary on PATH
    styles = ("tab10", "planck") if shutil.which("latex") else ("tab10",)
    for style in styles:
        try:
            plots.set_active_style(style)
            g = plots.get_single_plotter(width_inch=4, auto_close=True)
            g.plot_2d([samples1, samples2], "x0", "x1", filled=True)
            export(g, f"style_{style}.png")
        finally:
            plots.set_active_style()

    print(f"\ngallery complete: {len(made)} figures in {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
