"""Offline forensics dashboard — the reference GUI's role, headless.

The reference app renders a live NanoVis window (pvio-pc/src/main.cpp:
87-470): tracked-feature overlays, FPS / input-output-lag / BA-time
graphs, IMU bias plots, and a 3D view of landmarks, plane patches and
camera frusta. A TPU serving host has no GUI; the same observability is
provided as (a) a per-frame `HistoryRecorder` sampling the forensics bus
and (b) a matplotlib dashboard rendered to PNG at the end of a run
(`render_dashboard`). Panels mirror main.cpp:

  * top-down (x, y) trajectory + landmark cloud + plane normals
    (main.cpp:353-470's 3D view, flattened),
  * side (x, z) profile,
  * stage timings: feature tracker / BA solve / marginalization
    (main.cpp:163-167 graphs the same forensics slots),
  * rates and lag (core.cpp:166-189 measurements),
  * IMU gyro/accel bias evolution (main.cpp bias plots).
"""

import numpy as np

from pvio_tpu.utils.forensics import bus as default_bus


class HistoryRecorder:
    """Samples scalar forensics slots once per camera frame so the
    end-of-run dashboard can graph them over time."""

    SCALARS = (
        "camera_input_rate",
        "camera_real_rate",
        "input_output_lag",
        "feature_tracker_time",
        "bundle_adjustor_solve_time",
        "bundle_adjustor_marginalization_time",
        "sliding_window_landmarks",
        "sliding_window_planes",
    )
    VECTORS = ("imu_bias_gyroscope", "imu_bias_accelerometer")

    def __init__(self, bus=None):
        self.bus = bus or default_bus
        self.t = []
        self.scalars = {k: [] for k in self.SCALARS}
        self.vectors = {k: [] for k in self.VECTORS}

    def sample(self, t):
        self.t.append(float(t))
        for k in self.SCALARS:
            v = self.bus.get(k)
            self.scalars[k].append(float(v) if v is not None else np.nan)
        for k in self.VECTORS:
            v = self.bus.get(k)
            self.vectors[k].append(
                np.asarray(v, np.float64) if v is not None
                else np.full(3, np.nan)
            )


def render_feature_overlay(path, painter=None, bus=None):
    """Draw the tracked-feature overlay the reference GUI paints live
    (ForensicsPainter, forensics.h:30-38; main.cpp:33-85 draws keypoints
    and flow segments): grayscale frame + tracked keypoints (green, with
    prev->cur flow lines) + fresh detections (blue). `painter` defaults
    to the bus's latest `feature_tracker_painter` snapshot."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if painter is None:
        painter = (bus or default_bus).get("feature_tracker_painter")
    if painter is None:
        raise ValueError("no feature_tracker_painter snapshot available")

    img = np.asarray(painter["image"], np.float64)
    kp = np.asarray(painter["kp"])
    mask = np.asarray(painter["mask"], bool)
    tracked = np.asarray(painter["tracked"], bool)
    prev_kp = painter.get("prev_kp")

    h, w = img.shape
    fig, ax = plt.subplots(figsize=(w / 96, h / 96), dpi=96)
    ax.imshow(img, cmap="gray", interpolation="nearest")
    if prev_kp is not None:
        pk = np.asarray(prev_kp)
        for i in np.nonzero(mask & tracked)[0]:
            ax.plot([pk[i, 0], kp[i, 0]], [pk[i, 1], kp[i, 1]],
                    "-", lw=0.8, color="#fb8f44", alpha=0.9)
    t_idx = mask & tracked
    d_idx = mask & ~tracked
    if t_idx.any():
        ax.plot(kp[t_idx, 0], kp[t_idx, 1], "o", ms=3, mew=0.8,
                mfc="none", color="#2da44e", label=f"tracked ({t_idx.sum()})")
    if d_idx.any():
        ax.plot(kp[d_idx, 0], kp[d_idx, 1], "s", ms=3, mew=0.8,
                mfc="none", color="#218bff", label=f"new ({d_idx.sum()})")
    ax.legend(loc="lower right", fontsize=7)
    ax.set_title(f"frame {painter['frame_id']}  t={painter['t']:.3f}s",
                 fontsize=8)
    ax.set_axis_off()
    fig.tight_layout(pad=0.1)
    fig.savefig(path, dpi=96)
    plt.close(fig)
    return path


def _plot_trajectory(ax, traj, landmarks, planes, axes=(0, 1), labels="xy"):
    if traj is not None and len(traj):
        p = np.asarray([pose[2] for pose in traj], np.float64)
        ax.plot(p[:, axes[0]], p[:, axes[1]], "-", lw=1.2, color="#1f6feb",
                label="trajectory")
        ax.plot(p[-1, axes[0]], p[-1, axes[1]], "o", ms=5, color="#1f6feb")
    if landmarks is not None and len(landmarks):
        x = np.asarray(landmarks, np.float64)
        ax.scatter(x[:, axes[0]], x[:, axes[1]], s=2, alpha=0.4,
                   color="#57606a", label=f"landmarks ({len(x)})")
    if planes:
        for n, d in planes:
            # draw the plane's anchor point (closest point to origin) and
            # its normal direction projected into this view
            c = np.asarray(n, np.float64) * float(d)
            ax.annotate(
                "", xy=(c[axes[0]] + 0.3 * n[axes[0]],
                        c[axes[1]] + 0.3 * n[axes[1]]),
                xytext=(c[axes[0]], c[axes[1]]),
                arrowprops=dict(arrowstyle="->", color="#bf3989"),
            )
    ax.set_xlabel(labels[0] + " [m]")
    ax.set_ylabel(labels[1] + " [m]")
    ax.set_aspect("equal", adjustable="datalim")
    ax.legend(loc="best", fontsize=7)


def render_dashboard(path, trajectory=None, history: HistoryRecorder = None,
                     bus=None, title="pvio_tpu forensics"):
    """Render the end-of-run dashboard PNG. Returns the path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    bus = bus or default_bus
    landmarks = bus.get("sliding_window_landmark_points")
    planes = bus.get("sliding_window_plane_states")

    fig, axs = plt.subplots(2, 3, figsize=(15, 9))
    fig.suptitle(title)

    _plot_trajectory(axs[0, 0], trajectory, landmarks, planes,
                     axes=(0, 1), labels="xy")
    axs[0, 0].set_title("top-down view")
    _plot_trajectory(axs[0, 1], trajectory, landmarks, planes,
                     axes=(0, 2), labels="xz")
    axs[0, 1].set_title("side view")

    if history is not None and history.t:
        t = np.asarray(history.t) - history.t[0]
        ax = axs[0, 2]
        for key, label in (
            ("feature_tracker_time", "feature tracker"),
            ("bundle_adjustor_solve_time", "BA solve"),
            ("bundle_adjustor_marginalization_time", "marginalization"),
        ):
            y = np.asarray(history.scalars[key]) * 1e3
            ax.plot(t, y, lw=1.0, label=label)
        ax.set_title("stage timings")
        ax.set_xlabel("t [s]")
        ax.set_ylabel("ms (rolling avg)")
        ax.legend(fontsize=7)

        ax = axs[1, 0]
        for key, label in (
            ("camera_input_rate", "input fps"),
            ("camera_real_rate", "real fps"),
            ("sliding_window_landmarks", "landmarks"),
            ("sliding_window_planes", "planes"),
        ):
            ax.plot(t, history.scalars[key], lw=1.0, label=label)
        ax.plot(t, np.asarray(history.scalars["input_output_lag"]) * 1e3,
                lw=1.0, label="lag [ms]")
        ax.set_title("rates / counts")
        ax.set_xlabel("t [s]")
        ax.legend(fontsize=7)

        for col, (key, name, scale) in enumerate((
            ("imu_bias_gyroscope", "gyro bias [rad/s]", 1.0),
            ("imu_bias_accelerometer", "accel bias [m/s²]", 1.0),
        )):
            ax = axs[1, 1 + col]
            b = np.asarray(history.vectors[key])  # (N, 3)
            if b.size:
                for i, comp in enumerate("xyz"):
                    ax.plot(t, scale * b[:, i], lw=1.0, label=comp)
            ax.set_title(name)
            ax.set_xlabel("t [s]")
            ax.legend(fontsize=7)
    else:
        for ax in (axs[0, 2], axs[1, 0], axs[1, 1], axs[1, 2]):
            ax.axis("off")

    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
