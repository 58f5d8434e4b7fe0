"""The ONE definition of the benchmark/measurement program configuration.

bench.py (the driver-run benchmark) and the cost-model tools
(tools/roofline_fullstep.py, tools/hlo_table_traffic.py,
tools/tpu_compile_probe.py) must all compile the SAME program — the tools'
validity rests on analyzing exactly what bench measures. Build the pipeline
here so a change to the batch composition or model knobs cannot silently
desynchronize them.

Reference batch composition (BASELINE.md "Reference operating points"):
40x32^2 camera patches, 16,384 lidar rays, 16 radar scans.
"""

from __future__ import annotations

from typing import Optional


def bench_scene_outputs():
    """Reference-scale synthetic scene proxy shared by every scale."""
    from neuradar_tpu.data.dataparsers.synthetic import SyntheticDataParser, SyntheticDataParserConfig

    cfg = SyntheticDataParserConfig(num_frames=24, image_height=96, image_width=156,
                                    lidar_points_per_scan=32768)
    return SyntheticDataParser(cfg).get_dataparser_outputs()


def bench_datamanager_config(scale: str):
    """Batch composition for a ladder rung (bench.py docstring for the
    degraded-relay rationale behind the sub-scales)."""
    from neuradar_tpu.data.datamanager import ADDataManagerConfig

    if scale == "full":
        return ADDataManagerConfig(num_rgb_patches=40, patch_size=32, num_lidar_rays=16384,
                                   num_radar_scans=16, max_radar_gt=256)
    if scale == "half":
        return ADDataManagerConfig(num_rgb_patches=20, patch_size=32, num_lidar_rays=8192,
                                   num_radar_scans=8, max_radar_gt=256)
    # sub-scale rungs are OUR degraded-relay ladder (not reference spec);
    # lidar counts are nudged a few rays so each total stays divisible by
    # nff_chunks=8 now that a ZOD radar scan is 3531 rays (torch.arange
    # parity — cameras/radars.py fov_grid)
    if scale == "three8":
        return ADDataManagerConfig(num_rgb_patches=15, patch_size=32, num_lidar_rays=6150,
                                   num_radar_scans=6, max_radar_gt=256)
    if scale == "quarter":
        return ADDataManagerConfig(num_rgb_patches=10, patch_size=32, num_lidar_rays=4100,
                                   num_radar_scans=4, max_radar_gt=256)
    if scale == "eighth":
        return ADDataManagerConfig(num_rgb_patches=5, patch_size=32, num_lidar_rays=2050,
                                   num_radar_scans=2, max_radar_gt=256)
    if scale == "micro":
        return ADDataManagerConfig.micro()
    raise ValueError(f"unknown bench scale {scale!r}")


def bench_pipeline(scale: str = "full", chunks: int = 8,
                   remat_policy: Optional[str] = None, hoist: Optional[bool] = None,
                   radar_chunks: int = 0, packed_cells: bool = False):
    """The exact benchmark pipeline: reference batch + production model
    knobs (bf16, nff chunking; no pretrained VGG in this image).

    remat_policy/hoist: None keeps the production default
    (models/neuradar.py); pass explicitly only for A/B ablations.
    packed_cells: enable the packed-cell dense-level path on every grid
    (encodings.pack_cells — at production settings only the main static
    grid's levels 0-2 fit the 2^22-cell budget; the other grids no-op).
    """
    from neuradar_tpu.pipelines.ad_neuradar_pipeline import ADNeuRadarPipeline, ADNeuRadarPipelineConfig

    pipe_cfg = ADNeuRadarPipelineConfig(datamanager=bench_datamanager_config(scale))
    pipe_cfg.model.loss.vgg_mult = 0.0
    pipe_cfg.model.nff_chunks = chunks
    pipe_cfg.model.compute_dtype = "bfloat16"
    if radar_chunks:
        pipe_cfg.model.radar_decode_chunks = radar_chunks
    if remat_policy is not None:
        pipe_cfg.model.nff_remat_policy = remat_policy
    if hoist is not None:
        pipe_cfg.model.hoist_table_cast = hoist
    if packed_cells:
        m = pipe_cfg.model
        for grid in (m.field.grid, m.sampling.proposal_field_1.grid, m.sampling.proposal_field_2.grid):
            grid.static.packed_dense_cells = True
            grid.actor.packed_dense_cells = True
    return ADNeuRadarPipeline(pipe_cfg, bench_scene_outputs())


# ---------------------------------------------------------------------------
# Roofline self-interpretation (VERDICT r3 item 4)
# ---------------------------------------------------------------------------

V5E_HBM_BPS = 819e9  # public v5e HBM bandwidth

# Fit-corrected cost-model bytes per optimizer step for the EXACT bench
# programs above (tools/roofline_fullstep.py --fit, CPU layout, production
# knobs: chunks=8 bf16 hoist+save_grid). Gathers/scatters are charged as
# dense operand read+write, so these are UPPER BOUNDS on physical HBM
# traffic — achieved-GB/s derived from them can legitimately exceed 100% of
# SOL. Refresh via the tool whenever the model/batch changes; None disables
# the roofline fields in bench output.
MODELED_BYTES_PER_STEP = {
    # 2026-08-20, parity-corrected 113,840/6,608-ray programs, fit over
    # chunks (8, 16): full = 95.1 GB outside the nff scan + 400.6 GB scan
    # work; micro = 32.9 + 23.3 GB (/tmp artifacts banked in git log).
    "full": 495_733_915_648,
    "micro": 56_200_876_032,
}


def roofline_fields(scale: str, rays_per_batch: int, rays_per_sec: float) -> dict:
    """Achieved HBM GB/s + % of speed-of-light for a measured rays/s, so the
    bench JSON self-interprets against the roofline (BENCH_r04+)."""
    modeled = MODELED_BYTES_PER_STEP.get(scale)
    if not modeled or rays_per_sec <= 0:
        return {}
    steps_per_sec = rays_per_sec / rays_per_batch
    achieved = modeled * steps_per_sec
    return {
        "modeled_gb_per_step": round(modeled / 1e9, 1),
        "achieved_gbps_dense_counted": round(achieved / 1e9, 1),
        "pct_hbm_sol": round(100.0 * achieved / V5E_HBM_BPS, 1),
    }
