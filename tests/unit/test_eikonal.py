"""Eikonal solver + geodesic tracing tests."""

import numpy as np

import jax.numpy as jnp


def test_geodesic_distance_straight_tube():
    from plant3dvision_tpu.ops.eikonal import geodesic_distance

    nx, ny, nz = 8, 8, 40
    mask = np.zeros((nx, ny, nz), bool)
    mask[3:5, 3:5, :] = True
    seeds = np.zeros_like(mask)
    seeds[3:5, 3:5, 0] = True
    d = np.asarray(geodesic_distance(mask, seeds))
    # distance grows ~linearly along the tube
    line = d[3, 3, :]
    assert np.all(np.isfinite(line))
    np.testing.assert_allclose(line, np.arange(nz), atol=1.5)
    # outside the mask: INF
    assert d[0, 0, 10] > 1e9


def test_geodesic_distance_l_bend():
    from plant3dvision_tpu.ops.eikonal import geodesic_distance

    mask = np.zeros((30, 5, 30), bool)
    mask[:, 2, 2] = True          # leg along x at z=2
    mask[27, 2, 2:28] = True      # leg along z at x=27
    seeds = np.zeros_like(mask)
    seeds[0, 2, 2] = True
    d = np.asarray(geodesic_distance(mask, seeds))
    # end of the L: path length ~ 27 + 25
    assert abs(d[27, 2, 27] - (27 + 25)) < 3.0


def test_gradient_flow_points_downhill():
    from plant3dvision_tpu.ops.eikonal import geodesic_distance, gradient_flow

    mask = np.zeros((6, 6, 30), bool)
    mask[2:4, 2:4, :] = True
    seeds = np.zeros_like(mask)
    seeds[2:4, 2:4, 0] = True
    d = geodesic_distance(mask, seeds)
    flow = np.asarray(gradient_flow(d, jnp.asarray(mask)))
    # inside the tube, the descent direction -flow z-component is negative
    assert flow[2, 2, 15, 2] > 0.9  # gradient points along +z (increasing d)


def test_trace_geodesics_votes_along_tube():
    from plant3dvision_tpu.ops.eikonal import geodesic_distance, gradient_flow
    from plant3dvision_tpu.ops.geodesics import trace_geodesics

    mask = np.zeros((6, 6, 30), bool)
    mask[2:4, 2:4, :] = True
    seeds = np.zeros_like(mask)
    seeds[2:4, 2:4, 0] = True
    d = geodesic_distance(mask, seeds)
    flow = gradient_flow(d, jnp.asarray(mask))
    tips = jnp.asarray(np.array([[2.5, 2.5, 28.0]], np.float32))
    votes = np.asarray(trace_geodesics(flow, jnp.where(jnp.asarray(mask), d, 0.0),
                                       tips, step=0.5, n_steps=200))
    # votes accumulate down the tube toward the seed
    assert votes.sum() > 20
    # the trace walks the whole tube: votes spread over the interior band
    assert votes[:, :, 5:25].sum() > 0.6 * votes.sum()
    assert votes[2:4, 2:4].sum() == votes.sum()  # never leaves the tube
