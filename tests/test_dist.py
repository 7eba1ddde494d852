"""Multi-host runtime tests (parity: mmdet init_dist +
DistributedGroupSampler + collect_results, SURVEY §2.3/§2.4).

Single-host pieces run on the 8-device CPU mesh with an injected
allgather; test_gather_results_two_process_gloo additionally spawns
TWO real processes over jax.distributed (this jaxlib ships Gloo CPU
collectives) and runs the real process_allgather path.
"""

import functools
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from aidet_tpu.parallel import (create_mesh, gather_results,
                                init_distributed, local_batch_to_global)

from test_models_forward import IMG, demo_inputs


def test_init_distributed_single_process_noop():
    pid, pcount = init_distributed()
    assert pid == 0 and pcount == 1


def test_local_batch_to_global_single_process():
    mesh = create_mesh(8)
    batch = dict(x=np.arange(32, dtype=np.float32).reshape(8, 4),
                 s=np.float32(3.0))
    g = local_batch_to_global(batch, mesh)
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])
    assert g["x"].sharding.spec == jax.sharding.PartitionSpec("data")


def test_gather_results_restores_dataset_order():
    """Two simulated processes, dataset of 5 → shards [0,2,4] and
    [1,3]; the gathered list must be in dataset order with the pad
    row dropped."""
    total, num_shards = 5, 2

    def make(i):
        return dict(boxes=np.full((3, 4), float(i), np.float32),
                    scores=np.full((3,), float(i), np.float32))

    shards = {0: [make(0), make(2), make(4)], 1: [make(1), make(3)]}

    def fake_allgather(arr):
        # emulate both processes' stacked+padded arrays
        mine = arr
        other_id = 1 if fake_allgather.shard_id == 0 else 0
        other_res = shards[other_id]
        n_max = mine.shape[0]
        o = np.stack([np.asarray(r[fake_allgather.key]) for r in other_res])
        if o.shape[0] < n_max:
            o = np.concatenate(
                [o, np.zeros((n_max - o.shape[0],) + o.shape[1:],
                             o.dtype)])
        pair = [None, None]
        pair[fake_allgather.shard_id] = mine
        pair[other_id] = o
        return np.stack(pair)

    for shard_id in (0, 1):
        fake_allgather.shard_id = shard_id

        def ag(arr, _key=[None]):
            return fake_allgather(arr)

        # run key-aware: wrap to know which key is being gathered
        results = shards[shard_id]
        keys = sorted(results[0].keys())
        it = iter(keys * 2)

        def ag2(arr):
            fake_allgather.key = next(it)
            return fake_allgather(arr)

        ordered = gather_results(results, num_shards, shard_id, total,
                                 allgather=ag2)
        assert len(ordered) == total
        for i, r in enumerate(ordered):
            assert float(r["scores"][0]) == float(i), (shard_id, i)
            assert float(r["boxes"][0, 0]) == float(i)


def test_gather_results_empty_shard_uses_example():
    """num_shards > dataset length: the empty shard must still join the
    collective with zero-padded arrays built from the template."""
    total, num_shards = 1, 2
    r0 = dict(scores=np.full((3,), 7.0, np.float32))
    example = dict(scores=np.zeros((3,), np.float32))

    def ag_for(shard_id):
        def ag(arr):
            mine = arr
            if shard_id == 0:   # other (shard 1) is empty → zeros
                other = np.zeros_like(arr)
                return np.stack([mine, other])
            other = np.stack([np.asarray(r0["scores"])])
            return np.stack([other, mine])
        return ag

    out0 = gather_results([r0], num_shards, 0, total,
                          allgather=ag_for(0))
    out1 = gather_results([], num_shards, 1, total,
                          allgather=ag_for(1), example=example)
    for out in (out0, out1):
        assert len(out) == total
        assert float(out[0]["scores"][0]) == 7.0

    # no template + empty shard → loud failure, not IndexError
    import pytest
    with pytest.raises(ValueError, match="example"):
        gather_results([], num_shards, 1, total, allgather=ag_for(1))


def test_gather_results_two_process_gloo():
    """REAL 2-process gather: spawn two jax.distributed CPU processes
    (Gloo collectives) running the default process_allgather path of
    gather_results — ordering, short-shard padding and the empty-shard
    template all over the actual collective."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(
                   p for p in (repo_root, os.environ.get("PYTHONPATH"))
                   if p))
    env.pop("XLA_FLAGS", None)  # no forced 8-device host count
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} OK" in out, out


def test_sharded_inference_matches_single(tmp_path):
    """run_inference over an 8-device CPU mesh must reproduce the
    unsharded results (multi_gpu_test parity on one host)."""
    import cv2
    from aidet_tpu.apis.test import run_inference
    from aidet_tpu.models import build_detector

    rng = np.random.RandomState(0)
    infos = []
    for i in range(3):
        img = rng.randint(0, 255, (96 + 16 * i, 128, 3), np.uint8)
        p = tmp_path / f"im{i}.png"
        cv2.imwrite(str(p), img)
        infos.append(dict(file_name=f"im{i}.png", height=img.shape[0],
                          width=img.shape[1]))

    class DS:
        img_infos = infos

        def __len__(self):
            return len(infos)

        def img_path(self, i):
            return str(tmp_path / infos[i]["file_name"])

    model = build_detector(dict(
        type="FasterRCNN",
        backbone=dict(type="ResNet", depth=18),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=64, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=64, feat_channels=64,
                      num_anchors=3),
        bbox_head=dict(type="SharedFCBBoxHead", num_classes=16,
                       in_channels=64, fc_out_channels=128),
        test_cfg=dict(rpn=dict(nms_pre=200, nms_post=100, max_num=100),
                      rcnn=dict(max_per_img=10)),
        img_size=IMG))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))

    res1, names1 = run_inference(model, variables, DS(), batch_size=8,
                                 img_size=IMG)
    mesh = create_mesh(8)
    res2, names2 = run_inference(model, variables, DS(), batch_size=8,
                                 img_size=IMG, mesh=mesh)
    assert names1 == names2
    for a, b in zip(res1, res2):
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]),
                                       np.asarray(b[k]),
                                       rtol=2e-3, atol=2e-3)
