"""Examples-as-tests (the reference runs its examples inside the suite,
runtests.jl:684-703)."""
import importlib.util
import os
import sys

import numpy as np
import pytest

_EX = os.path.join(os.path.dirname(__file__), "..", "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_EX, name + ".py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_lineargaussian_example():
    mod = _load("example_lineargaussian")
    sol, ssol, sol_pf = mod.main()
    # PF at N=10k reproduces the exact KF loglik closely
    assert abs(float(sol_pf.ll) - float(sol.ll)) < 0.02 * abs(float(sol.ll))


def test_quadtank_example():
    mod = _load("example_quadtank")
    sol_ukf, sol_ekf, ssol, sol_pf, xs = mod.main()
    import jax.numpy as jnp

    rmse = lambda est: float(jnp.sqrt(jnp.mean((est - xs) ** 2)))
    # UKF ≈ EKF on this mildly nonlinear system; smoothing improves RMSE
    assert abs(float(sol_ukf.ll) - float(sol_ekf.ll)) < 0.05 * abs(float(sol_ukf.ll))
    assert rmse(ssol.xT) < rmse(sol_ukf.xt)


def test_beetle_example():
    mod = _load("example_beetle")
    sol, xs = mod.main()
    import jax.numpy as jnp
    import lowlevelparticlefilters_jl_tpu as llpf

    m = llpf.mean_trajectory(sol.x, sol.we)
    pos_rmse = float(jnp.sqrt(jnp.mean((m[:, :2] - xs[:, :2]) ** 2)))
    assert pos_rmse < 0.3


def test_nn_dynamics_example():
    """examples/example_nn_dynamics.py (neural_network.md analogue): the
    EKF-trained network must predict better at the end of the data than
    early on, and the weight covariance must contract."""
    mod = _load("example_nn_dynamics")
    rmse_early, rmse_final, rmse_refined = mod.main()
    assert np.isfinite(rmse_final)
    assert rmse_final < rmse_early
    assert rmse_refined <= rmse_final * 1.05  # refinement never hurts much


def test_nonlinear_kf_example():
    """examples/example_nonlinear_kf.py (example_nonlinear_kf.jl analogue):
    UKF/EKF/IEKF on the bearings-only problem; the iterated EKF should not
    be worse than the plain EKF on this strongly nonlinear measurement."""
    ex = _load("example_nonlinear_kf")

    ukf_rms, ekf_rms, iekf_rms = ex.bearings_only(N=8, Tmax=40)
    for r in (ukf_rms, ekf_rms, iekf_rms):
        assert np.all(np.isfinite(r))
    # errors should contract as the filters converge on the static target
    assert ukf_rms[-5:].mean() < ukf_rms[:5].mean()
    assert iekf_rms.mean() <= ekf_rms.mean() * 1.1


def test_friction_nn_example():
    """examples/example_friction_nn.py (friction_nn_example.md analogue):
    the EKF-learned friction curve matches the truth over the excited
    velocity range, and the IndexingMatrix measurement model stays on the
    gather path (no dense C)."""
    mod = _load("example_friction_nn")
    sol, (vgrid, f_nn_mid, f_nn_end, f_true_0, f_true_end) = mod.main()
    assert bool(np.isfinite(float(sol.ll)))
    mask = np.abs(np.asarray(vgrid)) > 0.25
    err = np.asarray(f_nn_end)[mask] - np.asarray(f_true_0)[mask]
    assert np.sqrt(np.mean(err**2)) < 0.6


def test_beetle_imm_example():
    """examples/example_beetle_imm.py (beetle_example_imm.md analogue):
    mode probabilities detect the sticky switch, and gradient tuning
    does not reduce the log-likelihood."""
    mod = _load("example_beetle_imm")
    sol, sol_opt, xs = mod.main()
    mu = np.asarray(sol_opt.extra)
    t_switch = 150
    assert mu[t_switch - 10, 1] < 0.5       # pre-switch: goal mode
    assert mu[t_switch + 25 :, 1].mean() > 0.5  # post-switch: search mode
    assert float(sol_opt.ll) >= float(sol.ll) - 1e-3


def test_thermal_nn_example():
    """examples/example_thermal_nn.py (thermal_nn_example.md analogue):
    the RBF clear-sky insolation profile learned by grad-through-sse
    matches the truth during daytime, with cloud cover tracked online."""
    mod = _load("example_thermal_nn")
    theta, rel, cloud_rmse, sol = mod.main()
    assert np.isfinite(np.asarray(theta)).all()
    assert rel < 0.15, f"daytime insolation profile rel RMSE {rel}"
    assert cloud_rmse < 0.35


def test_quadtank_fault_estimation():
    """example_quadtank.jl:56-88 second act: an augmented-state UKF
    tracks the doubled tank-1 outlet area online (the reference asserts
    a1 ~ 0.03 pre-fault and ~ 0.06 post-fault)."""
    mod = _load("example_quadtank")
    sol, a1_est, pre, post = mod.fault_estimation()
    assert abs(pre - 0.03) < 0.01
    assert abs(post - 0.06) < 0.01


def test_parallel_smoothing_example():
    mod = _load("example_parallel_smoothing")
    psol, ssol, pss, pnl, snl = mod.main(T=400)
    # parallel linear filter reproduces the sequential one
    assert abs(float(psol.ll) - float(ssol.ll)) < 1e-3 * abs(float(ssol.ll))
    np.testing.assert_allclose(np.asarray(pss.xT[-1]),
                               np.asarray(psol.xt[-1]), atol=1e-4)
    # nonlinear parallel smoother agrees with the sequential unscented
    # RTS to linearization tolerance
    rmse = float(np.sqrt(np.mean((np.asarray(pnl.xT) - np.asarray(snl.xT)) ** 2)))
    scale = float(np.sqrt(np.mean(np.asarray(snl.xT) ** 2)))
    assert rmse < 0.05 * scale, (rmse, scale)
    assert bool(np.asarray(pnl.sol.ok).all())
