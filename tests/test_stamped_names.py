"""Content-stamped program names (utils/misc.py: code_fingerprint/stamped).

The axon remote-compile helper caches executables by program NAME + input
shapes, not HLO content (docs/PERF.md "measurement hazard") — so two
semantically different programs with equal names and shapes silently share
one binary. The defenses pinned here: the package-source fingerprint in
every long-lived program name, and a config salt for constants that are
baked into the traced graph without changing shapes (thresholds, loss
weights, chunk sizes)."""

import jax
import numpy as np

from isegprobe_tpu.utils.misc import code_fingerprint, stamped


def test_stamped_embeds_fingerprint_and_salt():
    def f(x):
        return x + 1

    fp = code_fingerprint()
    assert stamped(f).__name__ == f"f_{fp}"

    def g(x):
        return x + 1

    def h(x):
        return x + 1

    a = stamped(g, salt=("cfg", 0.9)).__name__
    b = stamped(h, salt=("cfg", 0.85)).__name__
    assert a.startswith(f"g_{fp}_") and b.startswith(f"h_{fp}_")
    assert a.split("_")[-1] != b.split("_")[-1], "salt hash must differ"

    def g2(x):
        return x + 1

    assert stamped(g2, salt=("cfg", 0.9)).__name__.split("_")[-1] == \
        a.split("_")[-1], "equal salt must reuse the cache key"


def test_device_evaluators_salt_program_names():
    """Two evaluators differing only in a baked constant (target_iou) have
    identical input shapes — their compiled program names MUST differ or the
    name+shape-keyed executable cache would serve one's binary for the
    other."""
    from isegprobe_tpu.inference.device_eval import make_device_evaluator
    from isegprobe_tpu.models.probe_model import iSegProbeModel

    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(56, 56), patch_size=(14, 14), embed_dim=384),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1, num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )
    common = dict(target_size=(56, 56), max_clicks=3, net_clicks_limit=3,
                  pred_thr=0.49, with_flip=True)
    r90 = make_device_evaluator(model, target_iou=0.90, **common)
    r85 = make_device_evaluator(model, target_iou=0.85, **common)
    n90 = r90.__wrapped__.__name__
    n85 = r85.__wrapped__.__name__
    assert n90 != n85, (n90, n85)
    # determinism: same config -> same name (compile-cache reuse)
    again = make_device_evaluator(model, target_iou=0.90, **common)
    assert again.__wrapped__.__name__ == n90


def test_stamped_handles_partial_objects():
    import functools

    def base(a, b):
        return a + b

    p = stamped(functools.partial(base, 1), salt="s")
    assert p.__name__.startswith("base_")
    assert p(2) == 3
    assert np.isfinite(jax.jit(lambda x: x)(1.0))  # keep jax import honest


def test_mesh_and_unsharded_evaluators_get_distinct_names():
    """Mesh-sharded vs unsharded evaluators take identically-shaped inputs
    and differ only in in_shardings — the mesh layout must enter the salt."""
    from isegprobe_tpu.inference.device_eval import make_device_evaluator
    from isegprobe_tpu.models.probe_model import iSegProbeModel
    from isegprobe_tpu.parallel.mesh import make_mesh

    model = iSegProbeModel(
        backbone_cfg=dict(type="dinov2",
                          params=dict(feats_injection_mode="before_backbone")),
        embed_coords_cfg=dict(
            type="patchEmbed",
            params=dict(img_size=(56, 56), patch_size=(14, 14), embed_dim=384),
        ),
        head_cfg=dict(type="convhead",
                      params=dict(in_channels=384, num_layers=1, num_classes=1)),
        upsampler_cfg=dict(type="identity", params=dict()),
        use_disks=True, norm_radius=5, with_prev_mask=True, attn_impl="jnp",
    )
    common = dict(target_size=(56, 56), max_clicks=3, net_clicks_limit=3,
                  pred_thr=0.49, with_flip=True, target_iou=0.9, batch_size=8)
    plain = make_device_evaluator(model, **common)
    meshed = make_device_evaluator(model, mesh=make_mesh(8), **common)
    assert plain.__wrapped__.__name__ != meshed.__wrapped__.__name__


def test_trainer_step_salt_covers_lr():
    """lr is popped out of optimizer_params before the salt is built and the
    schedule bakes steps_per_epoch — two trainers differing only in lr must
    compile distinctly-named steps (regression: identical names + shapes =
    stale-binary aliasing on the name-keyed executable cache)."""
    import types

    from isegprobe_tpu.models.probe_model import iSegProbeModel
    from isegprobe_tpu.training.losses import NormalizedFocalLossSigmoid
    from isegprobe_tpu.training.trainer import iSegTrainer

    hw, n_points = 28, 3

    class TinySet:
        def __len__(self):
            return 4

        def get_samples_number(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            img = rng.random((hw, hw, 3), dtype=np.float32)
            mask = np.zeros((hw, hw, 1), dtype=np.float32)
            mask[8:20, 6:20] = 1
            pts = np.full((2 * n_points, 3), -1.0, dtype=np.float32)
            pts[0] = [12, 10, 0]
            return {"images": img, "points": pts, "instances": mask}

    def make(lr):
        model = iSegProbeModel(
            backbone_cfg=dict(type="dinov2",
                              params=dict(feats_injection_mode="before_backbone")),
            embed_coords_cfg=dict(
                type="patchEmbed",
                params=dict(img_size=(hw, hw), patch_size=(14, 14),
                            embed_dim=384),
            ),
            head_cfg=dict(type="convhead",
                          params=dict(in_channels=384, num_layers=1,
                                      num_classes=1)),
            upsampler_cfg=dict(type="identity", params=dict()),
            use_disks=True, norm_radius=5, with_prev_mask=True,
            attn_impl="jnp",
        )
        cfg = types.SimpleNamespace(
            dataloader=types.SimpleNamespace(batch_size=2, val_batch_size=2,
                                             workers=1),
            training=types.SimpleNamespace(start_epoch=0, weights=None),
            CHECKPOINTS_PATH="/tmp/isegprobe_salt_test_ckpts",
            LOGS_PATH=None,
        )
        return iSegTrainer(
            model, cfg,
            loss_cfg={"instance_loss": NormalizedFocalLossSigmoid(
                alpha=0.5, gamma=2), "instance_loss_weight": 1.0},
            trainset=TinySet(), valset=TinySet(),
            optimizer="adam", optimizer_params={"lr": lr},
            max_num_next_clicks=1, seed=0,
        )

    n_a = make(5e-5)._train_step.__wrapped__.__name__
    n_b = make(5e-4)._train_step.__wrapped__.__name__
    assert n_a != n_b, (n_a, n_b)
