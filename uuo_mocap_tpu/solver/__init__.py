from uuo_mocap_tpu.solver.lbfgs import LbfgsOptions, LbfgsResult, lbfgs_minimize, lbfgs_minimize_flat  # noqa: F401
