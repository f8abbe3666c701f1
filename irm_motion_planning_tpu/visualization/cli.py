"""Visualization CLI — one entry point for all four reference capabilities.

    python -m irm_motion_planning_tpu.visualization.cli --mode result
    python -m irm_motion_planning_tpu.visualization.cli --mode env --vis-gradient true
    python -m irm_motion_planning_tpu.visualization.cli --mode movement
    python -m irm_motion_planning_tpu.visualization.cli --mode series

Reads the solver's text outputs (trajectory_result.txt /
trajectory_series.txt) exactly like the reference scripts
(ref: visualization/visualization.py:91, visualize_series.py:164), so either
engine's results can be rendered.  Unlike the reference (which duplicates a
drifting copy of the flag parser per script, SURVEY.md §5.6), all scripts
share the solver CLI's parser — hyperparameters cannot diverge.
"""

from __future__ import annotations

import sys

import numpy as np


def main(argv=None) -> int:
    from ..cli import build_parser, config_from_args

    p = build_parser()
    p.add_argument("--mode", choices=["result", "env", "movement", "series"],
                   default="result")
    p.add_argument("--input", default="trajectory_result.txt")
    p.add_argument("--series-input", default="trajectory_series.txt")
    p.add_argument("--out", default=None)
    # full reference toggle set (ref: env_vis.py:45-52)
    _bool = lambda x: str(x).lower() == "true"  # noqa: E731
    p.add_argument("--vis-gradient", type=_bool, default=False)
    p.add_argument("--vis-legend", type=_bool, default=True)
    p.add_argument("--vis-sgb", type=_bool, default=True)
    p.add_argument("--vis-sg-robot", type=_bool, default=True)
    p.add_argument("--vis-obstacles", type=_bool, default=False)
    p.add_argument("--vis-straight-line", type=_bool, default=True)
    p.add_argument("--vis-final-ee", type=_bool, default=True)
    p.add_argument("--vis-final-robot", type=_bool, default=False)
    args = p.parse_args(argv)

    from ..ops.scenario import reference_scenario
    from . import animate, plots

    cfg = config_from_args(args)
    scn = reference_scenario(cfg)

    if args.mode == "env":
        out = args.out or "environment.png"
        try:
            traj = np.loadtxt(args.input)
        except OSError:
            traj = None
        print(plots.plot_environment(
            cfg, scn, out, args.vis_gradient, traj,
            show_legend=args.vis_legend,
            show_sgb=args.vis_sgb,
            show_sg_robot=args.vis_sg_robot,
            show_obstacles=args.vis_obstacles,
            show_straight_line=args.vis_straight_line,
            show_final_ee=args.vis_final_ee,
            show_final_robot=args.vis_final_robot,
        ))
        return 0

    if args.mode == "result":
        traj = np.loadtxt(args.input)
        out = args.out or "result.png"
        print(plots.plot_result(cfg, scn, traj, out))
        return 0

    if args.mode == "movement":
        traj = np.loadtxt(args.input)
        out = args.out or "trajectory_robotmovement.gif"
        print(animate.animate_robot_movement(cfg, scn, traj, out))
        return 0

    if args.mode == "series":
        flat = np.loadtxt(args.series_input)
        if flat.ndim == 1:
            flat = flat[None]
        series = flat.reshape(flat.shape[0], int(args.n_timesteps), args.n_joints)
        out = args.out or "trajectory_series.gif"
        print(animate.animate_series(cfg, scn, series, out))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
