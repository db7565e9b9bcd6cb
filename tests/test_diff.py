"""Differentiable tracing (tracer_tpu.diff): gradient correctness against
central finite differences, and end-to-end gradient optimization.

All on CPU float64 (conftest) with fixed PRNG keys — the pathwise
estimator differentiates one fixed realization, so grad and FD see the
same piecewise-smooth function. No reference anchor: the reference has
no gradient capability."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracer_tpu import diff, geometry as G, materials as M, spatial as sp
from tracer_tpu.scene import (Assembly, AssembledObject, Surface,
                              compile_scene)
from tracer_tpu.sources import disk_bundle


def _rows_of(meta, name):
    return np.nonzero(meta.row_logical == meta.index_of(name))[0]


def _mirror_receiver_scene():
    """45-degree flat mirror deflecting a downward beam onto a receiver
    plate at x = 6 facing the mirror."""
    mirror = Surface(G.rect_plate(3.0, 3.0), M.reflective(absorptivity=0.1),
                     rotation=sp.roty(np.pi / 4)[:3, :3], name="mirror")
    recv = Surface(G.rect_plate(8.0, 8.0), M.lambertian(absorptivity=0.9),
                   location=[6.0, 0.0, 0.0],
                   rotation=sp.roty(np.pi / 2)[:3, :3], name="receiver")
    return compile_scene(Assembly([AssembledObject([mirror, recv])]),
                         dtype=jnp.float64)


def _beam(n=2048, key=7):
    return disk_bundle(jax.random.PRNGKey(key), n, center=[0.0, 0.0, 4.0],
                       direction=[0.0, 0.0, -1.0], radius=0.8,
                       ang_range=1e-4, flux=1000.0)


def test_tilt_gradient_matches_finite_difference():
    """d(spot RMS about a receiver point)/d(mirror tilt) — the aiming
    derivative — matches central finite differences through a full
    2-bounce trace (intersect, specular reflect, Lambertian receiver)."""
    table, meta = _mirror_receiver_scene()
    m_rows = _rows_of(meta, "mirror")
    r_rows = _rows_of(meta, "receiver")
    beam = _beam()
    key = jax.random.PRNGKey(3)

    def loss(a):
        n = jnp.stack([jnp.sin(a), jnp.zeros_like(a), jnp.cos(a)])
        fr = diff.frame_to(n, jnp.zeros(3))
        t = diff.with_rows(table, m_rows, frame=fr[None])
        _, mom = diff.trace_diff(t, beam, key, bounces=3)
        return diff.spot_rms(mom, r_rows, center=(0.4, -0.3))

    a0 = jnp.asarray(np.pi / 4 + 0.02)
    g = jax.grad(loss)(a0)
    h = 1e-6
    fd = (loss(a0 + h) - loss(a0 - h)) / (2 * h)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_focal_length_gradient_matches_finite_difference():
    """d(focal-plane spot RMS)/d(dish curvature) through the quadric
    root solve: a parabolic dish under a parallel beam, receiver at the
    nominal focus, differentiated w.r.t. the quadric coefficient."""
    f0 = 2.0
    dish = Surface(G.parabolic_dish(2.0, f0), M.reflective(0.05),
                   name="dish")
    # small receiver at the focus; the ANNULAR beam passes around it
    recv = Surface(G.rect_plate(0.5, 0.5), M.lambertian(0.95),
                   location=[0.0, 0.0, f0],
                   rotation=sp.rotx(np.pi)[:3, :3], name="receiver")
    table, meta = compile_scene(Assembly([AssembledObject([dish, recv])]),
                                dtype=jnp.float64)
    d_rows = _rows_of(meta, "dish")
    r_rows = _rows_of(meta, "receiver")
    beam = disk_bundle(jax.random.PRNGKey(5), 2048,
                       center=[0.0, 0.0, 5.0], direction=[0.0, 0.0, -1.0],
                       radius=0.95, radius_in=0.45, ang_range=1e-4,
                       flux=1000.0)
    key = jax.random.PRNGKey(4)

    def loss(f):
        q = 1.0 / (4.0 * f)
        quad = jnp.zeros((10,), jnp.float64).at[0].set(q).at[1].set(q) \
            .at[8].set(-0.5)
        t = diff.with_rows(table, d_rows, quadric=quad[None])
        _, mom = diff.trace_diff(t, beam, key, bounces=3)
        return diff.spot_rms(mom, r_rows)

    # away from the optimum the derivative is O(1); check against FD
    fq = jnp.asarray(1.7)
    g = jax.grad(loss)(fq)
    h = 1e-6
    fd = (loss(fq + h) - loss(fq - h)) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)
    # and the defocused spot is larger than the focused one
    assert float(loss(fq)) > float(loss(jnp.asarray(f0)))


def test_vmap_design_sweep_matches_sequential():
    """The functional design composes with jax.vmap: a BATCH of dish
    curvatures traces as one XLA program (a parallel design sweep on one
    chip — no reference analog) and reproduces the sequential results."""
    f0 = 2.0
    dish = Surface(G.parabolic_dish(2.0, f0), M.reflective(0.05),
                   name="dish")
    recv = Surface(G.rect_plate(0.5, 0.5), M.lambertian(0.95),
                   location=[0.0, 0.0, f0],
                   rotation=sp.rotx(np.pi)[:3, :3], name="receiver")
    table, meta = compile_scene(Assembly([AssembledObject([dish, recv])]),
                                dtype=jnp.float64)
    d_rows = _rows_of(meta, "dish")
    r_rows = _rows_of(meta, "receiver")
    beam = disk_bundle(jax.random.PRNGKey(5), 1024,
                       center=[0.0, 0.0, 5.0], direction=[0.0, 0.0, -1.0],
                       radius=0.95, radius_in=0.45, ang_range=1e-4,
                       flux=1000.0)
    key = jax.random.PRNGKey(6)

    def loss(f):
        q = 1.0 / (4.0 * f)
        quad = jnp.zeros((10,), jnp.float64).at[0].set(q).at[1].set(q) \
            .at[8].set(-0.5)
        t = diff.with_rows(table, d_rows, quadric=quad[None])
        _, mom = diff.trace_diff(t, beam, key, bounces=3)
        return diff.spot_rms(mom, r_rows)

    fs = jnp.asarray([1.6, 1.8, 2.0, 2.4])
    batched = jax.jit(jax.vmap(loss))(fs)
    seq = jnp.stack([loss(f) for f in fs])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(seq),
                               rtol=1e-12)
    assert float(batched[2]) == min(float(v) for v in batched)


def test_absorptivity_gradient_is_incident_power():
    """d(receiver absorbed)/d(alpha) == incident power exactly (single
    interaction, absorbed = alpha * e_in) — an analytic gradient check
    through the accumulators and the shade energy bookkeeping."""
    table, meta = _mirror_receiver_scene()
    r_rows = _rows_of(meta, "receiver")
    beam = _beam()
    key = jax.random.PRNGKey(9)

    def absorbed(alpha):
        prm = table.opt_params[r_rows[0]]
        prm = prm.at[0].set(alpha)
        t = diff.with_rows(table, r_rows, opt_params=prm[None])
        acc, mom = diff.trace_diff(t, beam, key, bounces=2)
        return jnp.sum(mom.absorbed[r_rows]), jnp.sum(mom.e_in[r_rows])

    a = jnp.asarray(0.9)
    g = jax.grad(lambda x: absorbed(x)[0])(a)
    e_in = absorbed(a)[1]
    np.testing.assert_allclose(float(g), float(e_in), rtol=1e-12)


def test_aim_optimization_converges():
    """Gradient descent on the mirror tilt centers the reflected spot on
    an off-axis receiver target; the optimum matches the analytic aim
    angle (reflected direction must pass through the target point)."""
    table, meta = _mirror_receiver_scene()
    m_rows = _rows_of(meta, "mirror")
    r_rows = _rows_of(meta, "receiver")
    beam = _beam(n=512)
    key = jax.random.PRNGKey(11)
    target_local = (1.5, 0.0)

    def loss(a):
        n = jnp.stack([jnp.sin(a), jnp.zeros_like(a), jnp.cos(a)])
        fr = diff.frame_to(n, jnp.zeros(3))
        t = diff.with_rows(table, m_rows, frame=fr[None])
        _, mom = diff.trace_diff(t, beam, key, bounces=3)
        return diff.spot_rms(mom, r_rows, center=target_local)

    # Adam bounds the step size: the raw gradient is steep enough to jump
    # the spot clear off the receiver (where the pathwise loss degenerates
    # to zero capture — see the spot_rms docstring)
    import optax
    opt = optax.adam(5e-3)
    grad_fn = jax.jit(jax.value_and_grad(loss))
    a = jnp.asarray(np.pi / 4)
    state = opt.init(a)
    for _ in range(200):
        val, g = grad_fn(a)
        upd, state = opt.update(g, state)
        a = a + upd

    # analytic optimum: beam (0,0,-1) reflects to d=(sin 2a, 0, cos 2a);
    # receiver local x at the plane x=6 is -(z_hit) with this receiver
    # orientation, so hitting local x=1.5 needs z = -1.5 at x = 6.
    # The loss floor is the beam's own spot size (E[r^2] = R^2/2), so
    # compare against the loss AT the analytic aim; the empirical
    # minimizer differs from a_star by the sample centroid, O(R/sqrt(N)).
    a_star = 0.5 * np.arctan2(6.0, -1.5)
    assert float(val) < 1.2 * float(loss(jnp.asarray(a_star)))
    assert abs(float(a) - a_star) < 8e-3


def test_refractive_index_gradient_matches_finite_difference():
    """d(spot centroid)/d(refractive index) through the vector-Snell
    refraction and the Fresnel Russian roulette (fixed key: the roulette
    decisions are frozen, the refracted directions move smoothly)."""
    iface = Surface(G.rect_plate(10.0, 10.0),
                    M.refractive_homogenous(1.0, 1.5),
                    location=[0.0, 0.0, 1.0], name="iface")
    recv = Surface(G.rect_plate(20.0, 20.0), M.lambertian(1.0),
                   name="receiver")
    table, meta = compile_scene(Assembly([AssembledObject([iface, recv])]),
                                dtype=jnp.float64)
    i_rows = _rows_of(meta, "iface")
    r_rows = _rows_of(meta, "receiver")
    d = np.array([np.sin(0.5), 0.0, -np.cos(0.5)])
    beam = disk_bundle(jax.random.PRNGKey(21), 512,
                       center=[-2.0 * d[0], 0.0, 3.0], direction=d,
                       radius=0.5, ang_range=1e-4, flux=1000.0)
    key = jax.random.PRNGKey(22)

    def centroid_x(n2):
        prm = table.opt_params[i_rows[0]].at[1].set(n2)
        t = diff.with_rows(table, i_rows, opt_params=prm[None])
        _, mom = diff.trace_diff(t, beam, key, bounces=3)
        return diff.spot_centroid(mom, r_rows)[0]

    n0 = jnp.asarray(1.5)
    g = jax.grad(centroid_x)(n0)
    h = 1e-6
    fd = (centroid_x(n0 + h) - centroid_x(n0 - h)) / (2 * h)
    assert abs(float(fd)) > 1e-4   # the objective actually moves with n
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_slope_error_sigma_gradient_matches_finite_difference():
    """d(spot RMS)/d(slope-error sigma) — the mirror-quality calibration
    derivative: sigma scales the per-ray normal perturbation draws, so
    the pathwise gradient is smooth and positive (bigger errors, bigger
    spot). The scene must COMPILE with sigma > 0 — the slope-error code
    is statically pruned from scenes without the feature, where the
    gradient is (correctly, for that compiled program) zero."""
    mirror = Surface(G.rect_plate(3.0, 3.0),
                     M.reflective(absorptivity=0.1, sigma=2e-3),
                     rotation=sp.roty(np.pi / 4)[:3, :3], name="mirror")
    recv = Surface(G.rect_plate(8.0, 8.0), M.lambertian(absorptivity=0.9),
                   location=[6.0, 0.0, 0.0],
                   rotation=sp.roty(np.pi / 2)[:3, :3], name="receiver")
    table, meta = compile_scene(
        Assembly([AssembledObject([mirror, recv])]), dtype=jnp.float64)
    m_rows = _rows_of(meta, "mirror")
    r_rows = _rows_of(meta, "receiver")
    beam = _beam(n=2048)
    key = jax.random.PRNGKey(31)

    def loss(sigma):
        prm = table.opt_params[m_rows[0]].at[1].set(sigma)
        t = diff.with_rows(table, m_rows, opt_params=prm[None])
        _, mom = diff.trace_diff(t, beam, key, bounces=3)
        return diff.spot_rms(mom, r_rows)

    s0 = jnp.asarray(2e-3)
    g = jax.grad(loss)(s0)
    h = 1e-7
    fd = (loss(s0 + h) - loss(s0 - h)) / (2 * h)
    assert float(g) > 0.0
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


def test_fluxmap_fit_recovers_aim():
    """Differentiable soft-binned flux maps (DiffFluxSpec): the splat
    conserves energy, its gradient matches finite differences, and a
    least-squares fit of the model map to a 'measured' map (different
    PRNG key = independent MC noise) recovers the true aim angle — the
    flux-map-calibration inverse problem."""
    table, meta = _mirror_receiver_scene()
    m_rows = _rows_of(meta, "mirror")
    r_rows = _rows_of(meta, "receiver")
    spec = diff.DiffFluxSpec(rows=tuple(int(r) for r in r_rows),
                             xlim=(-4.0, 4.0), ylim=(-4.0, 4.0),
                             shape=(24, 24))
    beam = _beam(n=4096)

    def fluxmap(a, key):
        n = jnp.stack([jnp.sin(a), jnp.zeros_like(a), jnp.cos(a)])
        t = diff.with_rows(table, m_rows,
                           frame=diff.frame_to(n, jnp.zeros(3))[None])
        _, mom, (grid,) = diff.trace_diff(t, beam, key, bounces=3,
                                          fluxspecs=(spec,))
        return grid, mom

    a_true = jnp.asarray(np.pi / 4 + 0.05)
    measured, mom_t = fluxmap(a_true, jax.random.PRNGKey(40))
    # energy conservation of the splat: grid total == absorbed on rows
    np.testing.assert_allclose(float(jnp.sum(measured)),
                               float(jnp.sum(mom_t.absorbed[r_rows])),
                               rtol=1e-12)

    key_fit = jax.random.PRNGKey(41)

    def loss(a):
        grid, _ = fluxmap(a, key_fit)
        return jnp.mean((grid - measured) ** 2)

    a0 = jnp.asarray(np.pi / 4)
    g = jax.grad(loss)(a0)
    h = 1e-6
    fd = (loss(a0 + h) - loss(a0 - h)) / (2 * h)
    # the splat is piecewise LINEAR in hit position: rays crossing a bin
    # edge inside +-h contribute O(h) kink error to the FD, not to grad
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)

    import optax
    opt = optax.adam(2e-3)
    grad_fn = jax.jit(jax.value_and_grad(loss))
    a, state = a0, opt.init(a0)
    for _ in range(120):
        _, gr = grad_fn(a)
        upd, state = opt.update(gr, state)
        a = a + upd
    # recovered within MC noise of the independent measurement
    assert abs(float(a) - float(a_true)) < 2e-3


def test_checkpoint_matches_plain_gradient():
    """checkpoint=True (rematerialized backward) returns the same value
    and gradient as the plain scan."""
    table, meta = _mirror_receiver_scene()
    m_rows = _rows_of(meta, "mirror")
    r_rows = _rows_of(meta, "receiver")
    beam = _beam(n=256)
    key = jax.random.PRNGKey(51)

    def loss(a, ckpt):
        n = jnp.stack([jnp.sin(a), jnp.zeros_like(a), jnp.cos(a)])
        t = diff.with_rows(table, m_rows,
                           frame=diff.frame_to(n, jnp.zeros(3))[None])
        _, mom = diff.trace_diff(t, beam, key, bounces=4, checkpoint=ckpt)
        return diff.spot_rms(mom, r_rows)

    a0 = jnp.asarray(np.pi / 4 + 0.01)
    v0, g0 = jax.value_and_grad(lambda a: loss(a, False))(a0)
    v1, g1 = jax.value_and_grad(lambda a: loss(a, True))(a0)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-14)
    np.testing.assert_allclose(float(g0), float(g1), rtol=1e-12)


def test_frame_to_z_axis_fallback():
    """frame_to(normal = +-Z) returns a valid (NaN-free, orthonormal)
    frame via rotation_to_z's X-axis fallback instead of 0/0."""
    for nz in (1.0, -1.0):
        fr = diff.frame_to(jnp.asarray([0.0, 0.0, nz]), jnp.zeros(3))
        fr = np.asarray(fr)
        assert np.isfinite(fr).all()
        R = fr[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-14)
        np.testing.assert_allclose(R[:, 2], [0.0, 0.0, nz], atol=1e-14)


def test_sharded_gradient_matches_per_shard_sum():
    """Distributed differentiable tracing: trace_diff composes with
    shard_map over the ray axis + psum'd moment accumulators, and the
    gradient through the collective equals the sum of per-shard local
    traces (same folded keys) to round-off — gradients scale over the
    mesh like the forward trace does."""
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    table, meta = _mirror_receiver_scene()
    m_rows = _rows_of(meta, "mirror")
    r_rows = _rows_of(meta, "receiver")
    D = 4
    beam = _beam(n=512)
    key = jax.random.PRNGKey(61)
    mesh = Mesh(np.array(jax.devices()[:D]), ("rays",))

    def retilt(a):
        n = jnp.stack([jnp.sin(a), jnp.zeros_like(a), jnp.cos(a)])
        return diff.with_rows(table, m_rows,
                              frame=diff.frame_to(n, jnp.zeros(3))[None])

    def loss_sharded(a):
        t = retilt(a)

        def worker(b):
            k = jax.random.fold_in(key, jax.lax.axis_index("rays"))
            _, mom = diff.trace_diff(t, b, k, bounces=3)
            return jax.tree_util.tree_map(
                lambda x: jax.lax.psum(x, "rays"), mom)

        # check_vma=False like every internal shard_map (parallel.py): the
        # fast-winner gradient's custom_vjp backward (one-hot matmul
        # scene cotangents, kernels/intersect._take_rows) carries no
        # varying-axis manifest for the scan-carry checker
        mom = jax.shard_map(
            worker, mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P("rays"), beam),),
            out_specs=jax.tree_util.tree_map(lambda _: P(), MOM_PROTO),
            check_vma=False,
        )(beam)
        return diff.spot_rms(mom, r_rows, center=(0.4, -0.3))

    def loss_seq(a):
        t = retilt(a)
        shards = jax.tree_util.tree_map(
            lambda x: x.reshape((D, -1) + x.shape[1:]), beam)
        mom = None
        for d in range(D):
            b = jax.tree_util.tree_map(lambda x: x[d], shards)
            _, m = diff.trace_diff(t, b, jax.random.fold_in(key, d),
                                   bounces=3)
            mom = m if mom is None else jax.tree_util.tree_map(
                jnp.add, mom, m)
        return diff.spot_rms(mom, r_rows, center=(0.4, -0.3))

    MOM_PROTO = diff.MomentAccum.zeros(table.num_rows, jnp.float64)
    a0 = jnp.asarray(np.pi / 4 + 0.02)
    v_s, g_s = jax.value_and_grad(loss_sharded)(a0)
    v_q, g_q = jax.value_and_grad(loss_seq)(a0)
    np.testing.assert_allclose(float(v_s), float(v_q), rtol=1e-13)
    np.testing.assert_allclose(float(g_s), float(g_q), rtol=1e-11)


def test_volumetric_medium_gradients_match_finite_difference():
    """Gradients through the engine volumetrics: d(medium absorption)/
    d(att_coeff) through the Beer-Lambert segments and d(floor spot)/
    d(scat_g) through the Henyey-Greenstein phase draws (the sqrt sites
    guarded after the round-4 review) both match finite differences."""
    lam = lambda: M.lambertian(absorptivity=1.0)
    floor = Surface(G.rect_plate(20.0, 20.0), lam(), name="floor")
    table, meta = compile_scene(
        Assembly([AssembledObject([floor])]), dtype=jnp.float64,
        extra_features=("volumetric",))
    r_rows = _rows_of(meta, "floor")
    n = 2048
    key = jax.random.PRNGKey(71)

    def beam(att, scat, g):
        b = disk_bundle(jax.random.PRNGKey(70), n,
                        center=[0.0, 0.0, 3.0],
                        direction=[0.2, 0.0, -1.0], radius=0.5,
                        ang_range=1e-3, flux=1000.0)
        one = jnp.ones((n,), b.pos.dtype)
        return b.replace(att_coeff=att * one, scat_coeff=scat * one,
                         scat_g=g * one)

    def medium_loss(att):
        acc, _ = diff.trace_diff(table, beam(att, 0.4, 0.5), key,
                                 bounces=6)
        return acc.medium

    a0 = jnp.asarray(0.2)
    g = jax.grad(medium_loss)(a0)
    h = 1e-6
    fd = (medium_loss(a0 + h) - medium_loss(a0 - h)) / (2 * h)
    assert float(g) > 0.0   # more attenuation, more medium absorption
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)

    def spot(gg):
        _, mom = diff.trace_diff(table, beam(0.1, 0.4, gg), key,
                                 bounces=6)
        return diff.spot_rms(mom, r_rows)

    g0 = jnp.asarray(0.5)
    gr = jax.grad(spot)(g0)
    fd = (spot(g0 + h) - spot(g0 - h)) / (2 * h)
    assert np.isfinite(float(gr))
    np.testing.assert_allclose(float(gr), float(fd), rtol=1e-5)


def test_radiosity_jax_matches_numpy_and_analytic_gradient():
    """The differentiable radiosity solver reproduces the NumPy solver on
    a mixed-BC enclosure, matches the analytic concentric-spheres
    exchange, and d(Q1)/d(eps1) through the linear solve matches both the
    closed-form derivative and finite differences."""
    from tracer_tpu.analysis.radiosity import (SIGMA, radiosity_rtvf,
                                               radiosity_rtvf_jax)

    # ---- concentric spheres: analytic Q1 and its eps1-derivative
    A1, A2 = 1.0, 4.0
    VF = jnp.asarray([[0.0, 1.0], [A1 / A2, 1.0 - A1 / A2]])
    areas = jnp.asarray([A1, A2])
    T = jnp.asarray([600.0, 300.0])
    has_T = np.array([True, True])

    def Q1(eps1):
        eps = jnp.stack([eps1, jnp.asarray(0.5)])
        _, _, _, _, Q = radiosity_rtvf_jax(VF, areas, eps, T,
                                           jnp.zeros(2), has_T)
        return Q[0]

    def Q1_analytic(e1):
        denom = 1.0 / e1 + (A1 / A2) * (1.0 / 0.5 - 1.0)
        return SIGMA * A1 * (600.0 ** 4 - 300.0 ** 4) / denom

    e1 = jnp.asarray(0.8)
    np.testing.assert_allclose(float(Q1(e1)), Q1_analytic(0.8), rtol=1e-12)
    g = jax.grad(Q1)(e1)
    h = 1e-6
    fd = (Q1(e1 + h) - Q1(e1 - h)) / (2 * h)
    d_analytic = (Q1_analytic(0.8 + 1e-9) - Q1_analytic(0.8 - 1e-9)) / 2e-9
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-8)
    np.testing.assert_allclose(float(g), d_analytic, rtol=1e-6)

    # ---- mixed BCs: jax solver == numpy solver (flux BC on element 1)
    VF3 = np.array([[0.0, 0.6, 0.4], [0.3, 0.2, 0.5], [0.2, 0.5, 0.3]])
    areas3 = np.array([1.0, 2.0, 2.5])
    eps3 = np.array([0.9, 0.4, 1.0])
    T3 = np.array([500.0, np.nan, 350.0])
    inc3 = np.array([np.nan, 2000.0, np.nan])
    _, _, J_np, E_np, T_np, q_np, Q_np = radiosity_rtvf(
        VF3, areas3, eps3, T=T3, inc_radiation=inc3)
    J_j, E_j, T_j, q_j, Q_j = radiosity_rtvf_jax(
        VF3, areas3, eps3, jnp.asarray(T3), jnp.asarray(inc3),
        ~np.isnan(T3))
    for a, b in ((J_np, J_j), (E_np, E_j), (T_np, T_j), (q_np, q_j),
                 (Q_np, Q_j)):
        np.testing.assert_allclose(np.asarray(b), a, rtol=1e-12)


def test_source_direction_gradient():
    """Gradients also flow into the RayBundle: d(spot centroid)/d(beam
    tilt) through the source directions matches finite differences."""
    table, meta = _mirror_receiver_scene()
    r_rows = _rows_of(meta, "receiver")
    key = jax.random.PRNGKey(13)

    def centroid_x(tilt):
        b = _beam(n=1024)
        d = jnp.stack([jnp.sin(tilt), jnp.zeros_like(tilt),
                       -jnp.cos(tilt)])
        b = b.replace(dir=jnp.broadcast_to(d, b.dir.shape))
        _, mom = diff.trace_diff(table, b, key, bounces=3)
        return diff.spot_centroid(mom, r_rows)[0]

    t0 = jnp.asarray(0.03)
    g = jax.grad(centroid_x)(t0)
    h = 1e-6
    fd = (centroid_x(t0 + h) - centroid_x(t0 - h)) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)


def test_multirow_fast_winner_gradient_matches_finite_difference():
    """Scenes past the row threshold take the FAST-WINNER gradient path
    (round 5: nearest-hit winner choice under stop_gradient + per-ray
    differentiable recompute of the winner's distance, with the one-hot
    matmul backward of kernels.intersect._take_rows). The aiming
    derivative through a 50-mirror field must still match central finite
    differences — pinning the recompute path's gradients, which the
    small-scene tests above never enter."""
    mirrors = []
    rng = np.random.default_rng(11)
    for i in range(50):
        x, y = rng.uniform(-6, 6, 2)
        mirrors.append(Surface(
            G.rect_plate(1.2, 1.2), M.reflective(0.1),
            location=[x, y, 0.0], name=f"m{i}"))
    recv = Surface(G.rect_plate(30.0, 30.0), M.lambertian(0.9),
                   location=[0.0, 0.0, 20.0],
                   rotation=sp.rotx(np.pi)[:3, :3], name="receiver")
    table, meta = compile_scene(
        Assembly([AssembledObject(mirrors + [recv])]), dtype=jnp.float64)
    assert table.num_rows >= 48      # the fast-winner gate engages
    r_rows = _rows_of(meta, "receiver")
    beam = disk_bundle(jax.random.PRNGKey(5), 4096,
                       center=[0.0, 0.0, 8.0], direction=[0.0, 0.0, -1.0],
                       radius=7.0, ang_range=1e-4, flux=1000.0)
    key = jax.random.PRNGKey(9)

    def loss(a):
        d = beam.dir + a * jnp.cross(
            jnp.array([1.0, 0.0, 0.0], jnp.float64), beam.dir)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        _, mom = diff.trace_diff(table, beam.replace(dir=d), key,
                                 bounces=2)
        return diff.spot_rms(mom, r_rows)

    a0 = jnp.asarray(0.01)
    g = jax.grad(loss)(a0)
    h = 1e-6
    fd = (loss(a0 + h) - loss(a0 - h)) / (2.0 * h)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-4)
