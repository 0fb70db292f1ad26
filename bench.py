"""Benchmark: space-carving throughput on the reference test workload.

Workload (BASELINE.md): 60 views at 1440x1080, voxel grid 301x301x561
(50.9 M voxels) => 3.05 G voxel-view tests — the reference's
configs/test_geom_pipe_real.toml carving job. Two scenes:

- default: a synthetic plant (capsule-union arabidopsis) rendered at the
  workload geometry (driver metric, comparable across rounds);
- ``--fixture``: the real_plant fixture's OWN 60 masks (computed by the
  pipeline's Masks stage: linear [0,1,0], threshold 0.15, dilation 3)
  with self-calibrated cameras (TurntableCalibration, BA rms 0.84 px) —
  committed in bench_assets/real_fixture.npz by
  tools/make_bench_fixture.py (VERDICT r3 #1: pyramid throughput is
  occupancy/noise-dependent, so the headline must hold on real masks).

Engine: FUSED hierarchical conservative carve (parallel/carving_mp.py)
— the whole coarse-to-fine level loop is one jitted XLA program (no host
syncs), bit-identical to the brute-force kernel semantics
(kernels/backprojection.c), verified in tests/unit/test_parallel_carve.py.

Protocol (round 2, DEVICE-RESIDENT — more favorable than round 1's
per-iteration pack+upload): masks are bit-packed and uploaded once, each
timed iteration runs the whole carve program and pulls the bit-packed
alive mask. Rationale: a production pipeline holds the mask set on
device across carves, and host<->device link speed is environmental.
Effective throughput counts the full workload's voxel-view tests against
wall time.

Baseline for vs_baseline: the reference publishes NO numbers (BASELINE.md).
We use 305 Mvv/s — the rate that completes this exact workload in 10 s,
i.e. the driver's north-star budget for the ENTIRE geometric pipeline spent
on carving alone.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_MVVS = 305.0  # test workload (3.05G tests) in 10 s
SHAPE = (301, 301, 561)
VOXEL_SIZE = 0.5


def build_workload():
    from plant3dvision_tpu.ops.carving import pack_camera
    from plant3dvision_tpu.ops.carving_hier import pack_masks
    from plant3dvision_tpu.synth import SyntheticPlant, render_mask, turntable_cameras

    V, H, W = 60, 1080, 1440
    # plant centered in the bbox used by the reference test config
    plant = SyntheticPlant(n_fruits=15, divergence_deg=137.5, internode=6.0,
                           stem_radius=2.0, fruit_radius=1.5, fruit_length=35.0,
                           first_node=30.0)
    origin = np.array([-75.0, -75.0, -20.0], np.float32)
    cams_krt = turntable_cameras(V, dist=450.0, z=120.0, target=(0, 0, 70.0),
                                 f=1400.0, width=W, height=H)
    masks = np.zeros((V, H, W), np.uint8)
    cams = np.zeros((V, 16), np.float32)
    for v, (K, R, t) in enumerate(cams_krt):
        masks[v] = render_mask(plant, K, R, t, W, H, step=0.5)
        cams[v] = pack_camera([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], R, t)
    return pack_masks(masks), cams, (H, W), origin


def load_fixture_workload():
    """The committed real_plant workload (see module docstring): already
    bit-packed in the pack_masks layout. The carve bbox/grid is the
    pipeline's own (configs sel: x/y [300, 450], z [-175, 105] at
    0.5 mm => the same 301x301x561 grid as the synthetic scene)."""
    asset = Path(__file__).resolve().parent / "bench_assets" / "real_fixture.npz"
    data = np.load(asset, allow_pickle=False)
    H, W = (int(x) for x in data["hw"])
    origin = np.array([300.0, 300.0, -175.0], np.float32)
    return data["packed"], np.asarray(data["cams"], np.float32), (H, W), origin


def run_bench(packed, cams, hw, origin, metric, caps=(8192, 16384),
              cap_blocks=4096, engine="seq", min_seen=1):
    import jax
    import jax.numpy as jnp
    from plant3dvision_tpu.parallel.carving_mp import make_fused_carver

    V = len(packed)
    H, W = hw
    shape = SHAPE

    # Device-resident protocol: masks are bit-packed and uploaded ONCE
    # (a production pipeline holds the mask set on device across carves;
    # host<->device link speed is environmental, not kernel performance).
    # Each timed iteration runs the whole fused carve program and pulls
    # the device-side bit-packed alive mask (bit-equal to the int8
    # volume's ==1 plane, tests/unit/test_parallel_carve.py).
    packed = jnp.asarray(packed)
    cams_j = jnp.asarray(cams)
    valid_j = jnp.asarray(np.ones(V, bool))
    origin_j = jnp.asarray(origin, jnp.float32)
    # fine_tiles: the exact level fetches 32x32-px bit tiles with row
    # gathers (~10x the bytes/s of flat gathers on this device) and
    # picks each voxel's bit with an in-register select tree; the
    # dilated pyramids make the coarse box test a single tap.  Both are
    # bit-exact vs the byte-gather engine (tests/unit/test_parallel_carve).
    if engine == "vb":
        # view-chunked engine (ops/carving_vb.py): bit-exact but measured
        # SLOWER than the sequential chain (476 vs 374 ms/carve on the
        # v5e — docs/CARVE_CEILING.md dead end #8); kept for A/B
        from plant3dvision_tpu.ops.carving_vb import make_vb_carver
        fn = make_vb_carver(H, W, tuple(shape), caps=caps,
                            packed_output=True, min_seen=min_seen)
    else:
        # min_seen > 1 demotes background-fuzz ALIVE voxels on device
        # (opt-in cleanup validated vs a counting oracle,
        # tests/unit/test_carving_vb.py — the --fixture lane's ~25x
        # alive-set inflation is exactly such single-ray mask noise)
        fn = make_fused_carver(H, W, tuple(shape), caps=caps,
                               packed_output=True, fine_tiles=True,
                               min_seen=min_seen)

    # Single-transfer, BLOCK-COMPACTED pull (lossless): a carved plant is
    # sparse (~0.1% nonzero bytes on this workload), and the relay link
    # moves ~31 MB/s with a ~30 ms base latency — pulling the raw 6.4 MB
    # packed mask costs ~205 ms, a third of the whole carve. Instead the
    # program appends (counts | n_alive_blocks | block bitmap | the <= CAP
    # nonzero 64-byte blocks) and the host scatters the blocks back into
    # the full packed mask — bit-exact (verified against the direct pull
    # at warmup below), ~0.28 MB on the wire. Overflow of the block cap is
    # detected via n_alive_blocks, same contract as the carve caps.
    BS = 64                       # block bytes (512 voxels)
    PB = -(-int(np.prod(shape)) // 8)   # packed mask bytes
    NBLK = -(-PB // BS)
    CAP = cap_blocks              # max alive blocks (synthetic: ~3.5k)

    @jax.jit
    def carve_combined(p, cj, vj, oj, vsj):
        out, counts = fn(p, cj, vj, oj, vsj)
        blk = jnp.pad(out, (0, NBLK * BS - PB)).reshape(NBLK, BS)
        nz = blk.any(axis=1)
        n = nz.sum(dtype=jnp.int32)
        idx = jnp.nonzero(nz, size=CAP, fill_value=NBLK)[0]
        blk1 = jnp.concatenate([blk, jnp.zeros((1, BS), jnp.uint8)])
        comp = jnp.take(blk1, idx, axis=0)
        header = jax.lax.bitcast_convert_type(
            jnp.concatenate([counts, n[None]]), jnp.uint8).reshape(-1)
        return jnp.concatenate([header, jnp.packbits(nz), comp.reshape(-1)])

    N_COUNTS = 3  # undecided per level (2) + tile-window overflow
    HDR = (N_COUNTS + 1) * 4
    NBM = -(-NBLK // 8)

    def run_once():
        buf = np.asarray(carve_combined(packed, cams_j, valid_j, origin_j,
                                        jnp.float32(VOXEL_SIZE)))
        counts = buf[:N_COUNTS * 4].view(np.int32)
        assert (counts[:2] <= np.asarray(list(caps))).all(), counts
        assert counts[-1] == 0, f"tile-window overflow: {counts}"
        n = int(buf[N_COUNTS * 4:HDR].view(np.int32)[0])
        assert n <= CAP, f"alive-block cap overflow: {n} > {CAP}"
        bitmap = np.unpackbits(buf[HDR:HDR + NBM])[:NBLK]
        comp = buf[HDR + NBM:].reshape(CAP, BS)
        full = np.zeros((NBLK, BS), np.uint8)
        full[np.flatnonzero(bitmap)] = comp[:n]
        return np.unpackbits(full.reshape(-1)[:PB])

    bits = run_once()   # warmup/compile
    assert bits.sum() > 1000, "carve produced an empty plant"
    # honesty check: the compacted pull reconstructs the direct pull
    direct = np.unpackbits(np.asarray(
        fn(packed, cams_j, valid_j, origin_j, jnp.float32(VOXEL_SIZE))[0]))
    assert (bits == direct).all(), "compacted pull is not bit-exact"

    # DEVICE-ONLY rate (VERDICT r4 #2): R carves inside ONE program so
    # dispatch + relay latency amortize away; each iteration rolls the
    # view axis (carving is view-order-invariant, so results are
    # bit-identical) to make the scan body genuinely data-dependent —
    # XLA cannot hoist a loop-invariant carve out of the scan. One
    # scalar pull forces completion.
    R = 4

    @jax.jit
    def carve_repeat(p, cj, vj, oj, vsj):
        def body(carry, s):
            out, counts = fn(jnp.roll(p, s, axis=0),
                             jnp.roll(cj, s, axis=0),
                             jnp.roll(vj, s, axis=0), oj, vsj)
            return carry + jnp.sum(out, dtype=jnp.uint32) \
                + jnp.sum(counts).astype(jnp.uint32), None
        carry, _ = jax.lax.scan(body, jnp.uint32(0),
                                jnp.arange(R, dtype=jnp.int32))
        return carry

    args = (packed, cams_j, valid_j, origin_j, jnp.float32(VOXEL_SIZE))
    float(carve_repeat(*args))  # warmup/compile
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(carve_repeat(*args))
        dts.append(time.perf_counter() - t0)

    tests = float(np.prod(shape)) * V
    device_mvvs = R * tests / min(dts) / 1e6

    # PROTOCOL-INCLUSIVE rate (the cross-round headline): full carve +
    # block-compacted result pull + host scatter/unpack. Steady-state
    # min over enough passes that relay jitter cannot move the number
    # (the round-4 driver capture regressed 8.6% on an unchanged engine
    # purely from host load in this part).
    times = []
    for _ in range(9):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    dt = min(times)

    mvvs = tests / dt / 1e6

    # PIPELINED rate: depth-2 dispatch (enqueue carve i+1 before pulling
    # carve i) — the per-carve result pull rides under the next carve's
    # device time, exactly how production pipelines consume repeated
    # carves (FusedCarving overlap_groups). Reported alongside; the
    # headline stays the sequential protocol for cross-round
    # comparability.
    NP_ = 6

    def _decode(buf):
        counts = buf[:N_COUNTS * 4].view(np.int32)
        n = int(buf[N_COUNTS * 4:HDR].view(np.int32)[0])
        bitmap = np.unpackbits(buf[HDR:HDR + NBM])[:NBLK]
        full = np.zeros((NBLK, BS), np.uint8)
        full[np.flatnonzero(bitmap)] = buf[HDR + NBM:].reshape(CAP, BS)[:n]
        return np.unpackbits(full.reshape(-1)[:PB])

    t0 = time.perf_counter()
    pending = None
    for _ in range(NP_):
        nxt = carve_combined(packed, cams_j, valid_j, origin_j,
                             jnp.float32(VOXEL_SIZE))
        if pending is not None:
            _decode(np.asarray(pending))
        pending = nxt
    _decode(np.asarray(pending))
    dt_p = (time.perf_counter() - t0) / NP_
    pipelined_mvvs = tests / dt_p / 1e6

    print(json.dumps({
        "metric": metric,
        "value": round(mvvs, 1),
        "unit": "Mvoxel-view/s",
        "vs_baseline": round(mvvs / BASELINE_MVVS, 2),
        "device_only_mvvs": round(device_mvvs, 1),
        "pipelined_mvvs": round(pipelined_mvvs, 1),
        "protocol_passes_s": [round(t, 4) for t in times],
    }))
    return mvvs, int(bits.sum())


def _argval(flag, default):
    if flag in sys.argv:
        i = sys.argv.index(flag) + 1
        if i >= len(sys.argv):
            raise SystemExit(f"{flag} needs a value")
        return sys.argv[i]
    return default


def main():
    engine = _argval("--engine", "seq")     # "seq" | "vb"
    if "--fixture" in sys.argv:
        import jax
        packed, cams, hw, origin = load_fixture_workload()
        # real masks (backdrop noise, dilation fuzz) straddle ~3x more
        # cells than the synthetic scene (9776/42093 undecided at the
        # box/fine levels vs ~5k/14k) and leave a ~25x larger alive set
        # (24.8k nonzero 64-byte blocks vs ~3.5k), hence the wider caps.
        # --min-seen N (vb engine) demotes ALIVE voxels seen by < N
        # views — the alive fuzz is single-ray mask noise, so a small N
        # collapses the compacted pull back to plant-sized (the raw
        # metric is reported alongside in the JSON).
        min_seen = int(_argval("--min-seen", "1"))
        mvvs, alive = run_bench(packed, cams, hw, origin,
                                "carve_throughput_fixture",
                                caps=(16384, 65536),
                                cap_blocks=(8192 if min_seen > 1
                                            else 32768),
                                engine=engine, min_seen=min_seen)
        if "--save" in sys.argv:
            report = Path(__file__).resolve().parent / "BENCH_FIXTURE.json"
            prev = {}
            if report.exists():
                prev = json.loads(report.read_text())
            entry = {
                "value": round(mvvs, 1), "unit": "Mvoxel-view/s",
                "vs_baseline": round(mvvs / BASELINE_MVVS, 2),
                "alive_voxels": alive,
                "engine": engine, "min_seen": min_seen,
                "device": str(jax.devices()[0]),
            }
            key = ("cleaned" if min_seen > 1 else "raw") + "_" + engine
            prev[key] = entry
            prev.setdefault("metric", "carve_throughput_fixture")
            prev.setdefault(
                "workload", "real_plant 60 masks (threshold 0.15, "
                "dilation 3) + TurntableCalibration cameras, "
                "grid 301x301x561 @ 0.5 mm")
            # keep the legacy top-level fields on the RAW run
            if min_seen == 1:
                prev.update(entry)
            report.write_text(json.dumps(prev, indent=1) + "\n")
    else:
        packed, cams, hw, origin = build_workload()
        run_bench(packed, cams, hw, origin, "carve_throughput",
                  engine=engine, min_seen=int(_argval("--min-seen", "1")))


if __name__ == "__main__":
    main()
