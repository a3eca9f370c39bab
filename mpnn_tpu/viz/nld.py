"""Node-link diagrams: the routing tree as nested pie-chart nodes.

Counterpart of reference scripts/make-nlds (and the per-epoch frame
generator scripts/make-videos). Each tree node is drawn as a circle whose
area encodes the evaluation-time probability mass stopping there
(radius ~ sqrt(p_cor + p_inc), reference make-nlds:46-229); the circle is a
pie of blue (correct) vs red (incorrect) mass, or per-class hues in the
by-class variant. Edges connect each node to its sinks; chains render as
vertical ladders, trees as recursive layouts."""

from os import makedirs
from os.path import join

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.patches import Wedge, Circle  # noqa: E402
import seaborn as sns  # noqa: E402


def _leaf_stats(node, split):
    p_cor = node[split].get("p_cor")
    p_inc = node[split].get("p_inc")
    return p_cor, p_inc


def _tree_width(desc):
    if not desc["sinks"]:
        return 1.0
    return max(1.0, sum(_tree_width(s) for s in desc["sinks"]))


def _tree_depth(desc):
    if not desc["sinks"]:
        return 0
    return 1 + max(_tree_depth(s) for s in desc["sinks"])


def _fig_dims(desc):
    """Per-net figure size scaled to the topology: wide branching trees
    (the reference's dr_tree has 48 leaf slots) get proportionally wider
    canvases so the pie nodes stay legible; chains keep the compact
    column the reference's chain grids use."""
    tw = _tree_width(desc["root"])
    td = _tree_depth(desc["root"])
    w = max(1.6, 0.26 * tw)
    # Content is drawn with equal aspect (tw x td data units): match the
    # canvas to it so wide trees don't sit in tall empty rows.
    h = max(2.4, w * (td + 1.5) / (tw + 1.5) + 0.4)
    return w, h


def _layout(desc, x0, x1, depth, pos):
    """Assign (x, -depth) positions; subtree widths set horizontal spans."""
    x = (x0 + x1) / 2
    pos.append((desc, x, -depth))
    if desc["sinks"]:
        widths = [_tree_width(s) for s in desc["sinks"]]
        total = sum(widths)
        cur = x0
        for s, w in zip(desc["sinks"], widths):
            span = (x1 - x0) * w / total
            _layout(s, cur, cur + span, depth + 1, pos)
            cur += span
    return pos


def _draw_node(ax, x, y, node, split, r_max=0.42, by_class=False,
               n_cls=None):
    p_cor, p_inc = _leaf_stats(node, split)
    if p_cor is None:  # interior node: small neutral dot
        ax.add_patch(Circle((x, y), 0.06, color="0.55", zorder=3))
        return
    mass = float(p_cor) + float(p_inc)
    r = r_max * np.sqrt(max(mass, 0.0))
    if r <= 1e-4:
        ax.add_patch(Circle((x, y), 0.02, color="0.8", zorder=3))
        return
    if by_class and "p_cor_by_cls" in node[split]:
        pc = np.asarray(node[split]["p_cor_by_cls"], float)
        pi = np.asarray(node[split]["p_inc_by_cls"], float)
        fracs = np.concatenate([pc, pi])
        n = len(pc)
        colors = (sns.color_palette("hls", n)
                  + [tuple(0.35 + 0.65 * np.array(c))
                     for c in sns.color_palette("hls", n)])
    else:
        fracs = np.asarray([float(p_cor), float(p_inc)])
        colors = ["#3465a4", "#cc0000"]
    total = fracs.sum()
    if total <= 0:
        return
    theta = 90.0
    for f, c in zip(fracs, colors):
        if f <= 0:
            continue
        dtheta = 360.0 * f / total
        ax.add_patch(Wedge((x, y), r, theta, theta + dtheta,
                           facecolor=c, edgecolor="none", zorder=3))
        theta += dtheta
    ax.add_patch(Circle((x, y), r, fill=False, color="0.3", lw=0.5,
                        zorder=4))


def draw_net(ax, desc, split="stats_ts", by_class=False):
    """Draw one network descriptor as a node-link diagram on ax."""
    pos = _layout(desc["root"], 0.0, max(_tree_width(desc["root"]), 1.0),
                  0, [])
    coords = {id(d): (x, y) for d, x, y in pos}
    for d, x, y in pos:
        for s in d["sinks"]:
            xs, ys = coords[id(s)]
            ax.plot([x, xs], [y, ys], c="0.75", lw=0.8, zorder=1)
    for d, x, y in pos:
        _draw_node(ax, x, y, d, split, by_class=by_class)
    ax.set_aspect("equal")
    ax.axis("off")
    xs = [x for _, x, _ in pos]
    ys = [y for _, _, y in pos]
    ax.set_xlim(min(xs) - 0.6, max(xs) + 0.6)
    ax.set_ylim(min(ys) - 0.6, max(ys) + 0.6)


def render_experiment_grid(logs, expt, out_path, split="stats_ts",
                           by_class=False):
    """One column per net of the sweep (reference chain grids)."""
    descs = logs.get(expt)
    if not descs:
        return None
    # Heterogeneous sweeps (the SR depth ladder) mix topology sizes: size
    # every cell for the largest net so deep chains stay legible.
    dims = [_fig_dims(d) for d in descs]
    w = max(d[0] for d in dims)
    h = max(d[1] for d in dims)
    n_cols = len(descs) if w * len(descs) <= 18 else max(1, int(18 // w))
    n_rows = -(-len(descs) // n_cols)
    fig, axes = plt.subplots(n_rows, n_cols,
                             figsize=(w * n_cols, h * n_rows),
                             squeeze=False)
    flat = [ax for row in axes for ax in row]
    for ax in flat[len(descs):]:
        ax.axis("off")
    for ax, desc in zip(flat, descs):
        draw_net(ax, desc, split, by_class)
    fig.suptitle(expt)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def render_video_frames(snapshots, out_dir, split="stats_ts",
                        by_class=False):
    """Per-epoch frames (reference scripts/make-videos:258-277): one PNG per
    descriptor snapshot; assemble with assemble_gif (or externally)."""
    makedirs(out_dir, exist_ok=True)
    paths = []
    for i, desc in enumerate(snapshots):
        w, h = _fig_dims(desc)
        fig, ax = plt.subplots(figsize=(max(w, 3.2), max(h, 5.0)))
        draw_net(ax, desc, split, by_class)
        path = join(out_dir, "%03i.png" % i)
        fig.savefig(path, dpi=120)
        plt.close(fig)
        paths.append(path)
    return paths


def assemble_gif(frame_paths, out_path, ms_per_frame=250):
    """Assemble rendered frames into an animated GIF (the in-repo analogue
    of the video files reference make-videos produces from its frame
    sequences). Frames may differ slightly in size (tight bboxes); they are
    letterboxed onto the largest canvas."""
    if not frame_paths:
        return None
    from PIL import Image
    frames = [Image.open(p).convert("RGB") for p in frame_paths]
    w = max(f.width for f in frames)
    h = max(f.height for f in frames)
    canvas = []
    for f in frames:
        c = Image.new("RGB", (w, h), (255, 255, 255))
        c.paste(f, ((w - f.width) // 2, (h - f.height) // 2))
        canvas.append(c)
    canvas[0].save(out_path, save_all=True, append_images=canvas[1:],
                   duration=ms_per_frame, loop=0)
    return out_path
