"""Batched Levenberg-Marquardt scan-to-grid matcher.

TPU-native counterpart of the reference's `CeresScanMatcher3D`
(`cartographer/mapping/internal/3d/scan_matching/ceres_scan_matcher_3d.cc`):
the same least-squares objective —

  * per grid g and point i:  w_g / sqrt(N_g) * (1 - interp_prob_g(T * p_i))
    (OccupiedSpaceCostFunction3D, occupied_space_cost_function_3d.h:69-80)
  * translation prior:  w_t * (t - t_target)
    (translation_delta_cost_functor_3d.h)
  * rotation prior:  w_r * imag(q_target^-1 * q)
    (rotation_delta_cost_functor_3d.h:41-52)

— but minimized by a fixed-iteration Levenberg-Marquardt loop on device
instead of Ceres autodiff + DENSE_QR on host. The pose is parameterized by a
6-dof tangent perturbation (dt, dw) with q' = q * exp(dw) (or yaw-only 4-dof,
the reference's YawOnlyQuaternionPlus); residual Jacobians come from
`jax.jacfwd` through the smoothed trilinear interpolation (analytic — the
same derivatives Ceres' Jet types compute), giving a (M, 6) Jacobian as one
batched pass, after which the 6x6 normal equations are solved in one step.
All shapes static; the whole solve jits into a single XLA computation.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from dliom_tpu.mapping.brick_grid import BrickBank, interpolated_probability_brick
from dliom_tpu.mapping.grid import GridSpec, interpolated_probability
from dliom_tpu.transform.rigid import (
    Rigid3,
    quat_from_axis_angle,
    quat_from_yaw,
    quat_multiply,
    quat_normalize,
    quat_conjugate,
)


class ScanMatcherResult(NamedTuple):
    pose: Rigid3
    cost: jnp.ndarray  # final summed squared residual
    initial_cost: jnp.ndarray
    iterations: jnp.ndarray = 0  # LM iterations actually run (Python int
    # default, NOT jnp: class creation runs at import, which must not
    # initialize a jax backend)


def _residuals(
    pose: Rigid3,
    clouds,  # sequence of (points (N,3), mask (N,)) in tracking frame
    grids,  # sequence of flat grid value arrays
    specs: Sequence[GridSpec],
    weights: Sequence[float],
    target_translation: jnp.ndarray,
    target_rotation: jnp.ndarray,
    translation_weight: float,
    rotation_weight: float,
    bases,
) -> jnp.ndarray:
    parts = []
    for (points, mask), values, spec, w, base in zip(
        clouds, grids, specs, weights, bases
    ):
        n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
        world = pose.apply(points)
        if isinstance(values, BrickBank):
            # brick high-res grid: `base` is the submap slot
            prob = interpolated_probability_brick(values, world, spec, base)
        else:
            prob = interpolated_probability(values, world, spec, base)
        r = (w / jnp.sqrt(n)) * (1.0 - prob)
        parts.append(jnp.where(mask, r, 0.0))
    parts.append(translation_weight * (pose.translation - target_translation))
    dq = quat_multiply(quat_conjugate(target_rotation), pose.rotation)
    # q and -q are one rotation; take the sign that makes the residual local
    dq = jnp.where(dq[0] < 0.0, -dq, dq)
    parts.append(rotation_weight * dq[1:4])
    return jnp.concatenate(parts)


def _apply_delta(pose: Rigid3, delta: jnp.ndarray, only_yaw: bool) -> Rigid3:
    # World-frame (left-multiplied) rotation perturbation, matching Ceres'
    # QuaternionParameterization / YawOnlyQuaternionPlus
    # (rotation_parameterization.h:27-39).
    if only_yaw:
        dq = quat_from_yaw(delta[3])
    else:
        dq = quat_from_axis_angle(delta[3:6])
    return Rigid3(
        rotation=quat_normalize(quat_multiply(dq, pose.rotation)),
        translation=pose.translation + delta[0:3],
    )


def match(
    initial_pose: Rigid3,
    clouds: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    grids: Sequence[jnp.ndarray],
    specs: Sequence[GridSpec],
    *,
    occupied_space_weights: Sequence[float],
    translation_weight: float,
    rotation_weight: float,
    target_translation: jnp.ndarray | None = None,
    only_optimize_yaw: bool = False,
    max_iterations: int = 12,
    initial_lambda: float = 1e-4,
    grid_bases: Sequence | None = None,
    function_tolerance: float = 0.0,
) -> ScanMatcherResult:
    """Refine `initial_pose` so the clouds (tracking frame) match the grids
    (submap frame). Mirrors CeresScanMatcher3D::Match: the translation prior
    pulls toward `target_translation` (the IMU-predicted position), the
    rotation prior toward the initial rotation.

    `grid_bases`: per-grid flat offset into a multi-submap bank (slot *
    num_cells); grids stay 1D so gathers hit the fast path.

    `function_tolerance` > 0 enables Ceres' convergence termination
    (TrustRegionMinimizer::FunctionToleranceReached: an accepted step whose
    |cost change| <= tol * cost ends the solve; the reference runs Ceres at
    its default 1e-6 — CreateCeresSolverOptions sets only max_num_iterations
    / num_threads / use_nonmonotonic_steps). Each LM iteration is one full
    residual+Jacobian gather pass against the grids — the dominant frontend
    cost — so a warm-started steady-state match that converges in 2-3
    iterations skips the rest instead of burning all `max_iterations`.
    0 keeps the fixed-trip unrolled loop (bit-identical to the historical
    behavior)."""
    if target_translation is None:
        target_translation = initial_pose.translation
    if grid_bases is None:
        grid_bases = [0] * len(grids)
    target_rotation = initial_pose.rotation
    ndelta = 4 if only_optimize_yaw else 6

    def residual_at(delta, pose):
        return _residuals(
            _apply_delta(pose, delta, only_optimize_yaw),
            clouds,
            grids,
            specs,
            occupied_space_weights,
            target_translation,
            target_rotation,
            translation_weight,
            rotation_weight,
            grid_bases,
        )

    zero = jnp.zeros(ndelta, jnp.float32)
    eye = jnp.eye(ndelta, dtype=jnp.float32)

    def r_and_jac(pose):
        """Residual and (M, ndelta) Jacobian in ONE gather pass: linearize
        computes the primal once (the expensive grid gathers); each tangent
        evaluation is pure arithmetic on the stored corner values."""
        r, jvp = jax.linearize(lambda d: residual_at(d, pose), zero)
        jac = jax.vmap(jvp, in_axes=0, out_axes=1)(eye)
        return r, jac

    # Levenberg-Marquardt with a Ceres-style trust region: damping is
    # (1/radius) * diag(J^T J); the gain ratio rho (actual vs model cost
    # reduction) gates acceptance and drives the radius update
    # (LevenbergMarquardtStrategy). The reference enables nonmonotonic steps
    # (trajectory_builder_3d.lua ceres_solver_options.use_nonmonotonic_steps)
    # so rho is measured against a decaying reference cost, letting the
    # solver step out of shallow side basins; the best accepted pose is
    # tracked and returned.
    #
    # The loop carries (r, J) of the last accepted pose, so each iteration
    # performs exactly one full residual+Jacobian evaluation (at the
    # candidate) — the candidate's cost check and the next iteration's
    # linearization share the same pass.
    def lm_step(carry):
        pose, r, jac, cost, radius, ref_cost, best_pose, best_cost = carry
        grad = jac.T @ r
        hess = jac.T @ jac
        d2 = jnp.clip(jnp.diag(hess), 1e-12, 1e32)
        # damped-SPD system: Cholesky beats LU's pivoting on TPU
        step = -jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(
                hess + (1.0 / radius) * jnp.diag(d2), lower=True
            ),
            grad,
        )
        cand = _apply_delta(pose, step, only_optimize_yaw)
        cand_r, cand_jac = r_and_jac(cand)
        new_cost = jnp.sum(cand_r * cand_r)
        model_reduction = -(2.0 * step @ grad + step @ (hess @ step))
        rho = (ref_cost - new_cost) / jnp.maximum(model_reduction, 1e-12)
        accept = rho > 1e-3
        sel = lambda a, b: jnp.where(accept, a, b)
        pose = jax.tree.map(sel, cand, pose)
        r = sel(cand_r, r)
        jac = sel(cand_jac, jac)
        # Ceres FunctionToleranceReached (trust_region_minimizer.cc): checked
        # for EVERY evaluated candidate, accepted or not — an already-
        # converged warm start whose proposals get rejected (rho ~ 0) must
        # still terminate, not burn the remaining trip count shrinking the
        # radius.
        converged = jnp.abs(cost - new_cost) <= function_tolerance * cost
        cost = sel(new_cost, cost)
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        radius = jnp.where(
            accept,
            jnp.minimum(radius / shrink, 1e6),
            jnp.maximum(radius * 0.25, 1e-6),
        )
        is_best = accept & (new_cost < best_cost)
        best_pose = jax.tree.map(
            lambda a, b: jnp.where(is_best, a, b), cand, best_pose
        )
        best_cost = jnp.where(is_best, new_cost, best_cost)
        ref_cost = jnp.where(accept, 0.5 * ref_cost + 0.5 * new_cost, ref_cost)
        new_carry = (pose, r, jac, cost, radius, ref_cost, best_pose, best_cost)
        return new_carry, converged

    del initial_lambda  # superseded by the trust-region radius
    r0, jac0 = r_and_jac(initial_pose)
    initial_cost = jnp.sum(r0 * r0)
    carry0 = (
        initial_pose,
        r0,
        jac0,
        initial_cost,
        jnp.float32(1e4),
        initial_cost,
        initial_pose,
        initial_cost,
    )
    if function_tolerance > 0.0:
        # Rolled loop with convergence exit: each skipped iteration saves a
        # full residual+Jacobian grid-gather pass (the frontend's dominant
        # cost); the ~30 us/iteration while-op overhead is far below one
        # eval. Under vmap the lanes share one while op (XLA ORs the
        # predicates), so a batch runs to its slowest lane — still a win
        # whenever all lanes are in warm-started steady state.
        def w_cond(state):
            i, done, _ = state
            return (i < max_iterations) & ~done

        def w_body(state):
            i, _, carry = state
            carry, converged = lm_step(carry)
            return i + 1, converged, carry

        iters, _, (_, _, _, _, _, _, pose, final_cost) = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), jnp.bool_(False), carry0)
        )
    else:
        # unroll: the trip count is small and static; fixed-trip historical
        # behavior (and no while-op overhead)
        (_, _, _, _, _, _, pose, final_cost), _ = jax.lax.scan(
            lambda c, _: (lm_step(c)[0], None),
            carry0,
            None,
            length=max_iterations,
            unroll=True,
        )
        iters = jnp.int32(max_iterations)
    return ScanMatcherResult(
        pose=pose, cost=final_cost, initial_cost=initial_cost, iterations=iters
    )
