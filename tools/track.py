"""MOT17 ByteTrack evaluation (reference tools/track.py).

Runs the streaming MOT driver over a COCO-format video test set, writes
per-video MOT txt files, and scores CLEAR-MOT vs gt if available.
"""
import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser():
    p = argparse.ArgumentParser("unicorn_tpu track (MOT17 ByteTrack)")
    p.add_argument("-f", "--exp_file", default=None)
    p.add_argument("-n", "--name", default=None)
    p.add_argument("-c", "--ckpt", default=None)
    p.add_argument("--result-dir", default="track_results")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--track-thresh", type=float, default=0.6)
    p.add_argument("--match-thresh", type=float, default=0.9)
    p.add_argument("--track-buffer", type=int, default=30)
    p.add_argument("--tracker", default="byte", choices=["byte", "sort"],
                   help="association: byte (default) or the legacy SORT "
                        "baseline (reference evaluate_sort). Ignored with "
                        "--fused (on-device BYTE).")
    p.add_argument("--chunk", type=int, default=32,
                   help="frames per lax.scan chunk in --fused mode")
    p.add_argument("--fused", action="store_true",
                   help="fully on-device serving pipeline (device NMS + jax "
                        "ByteTrack, lax.scan chunks; the bench.py path). "
                        "Honors --track-thresh/--match-thresh/--track-buffer "
                        "globally; the host path additionally applies the "
                        "reference's per-MOT17-video overrides.")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p


def load_gt_from_dataset(dataset):
    """Build {video: [(frame_id, ids, tlwhs, ignore_tlwhs)]} from the eval
    dataset's jsons. ignore_tlwhs are the MOT ignore regions (converter
    writes them as iscrowd/ignore annotations); MOTEvaluator.score
    suppresses predictions matched to them, the reference's
    evaluation.py:41-53 behavior."""
    gts = defaultdict(lambda: defaultdict(lambda: ([], [], [])))
    for img_id in dataset.ids:
        im = dataset.coco.imgs[img_id]
        video = im["file_name"].split("/")[0]
        fid = im.get("frame_id", 0)
        for a in dataset.coco.load_anns_for_img(img_id):
            x, y, w, h = a["bbox"]
            if a.get("ignore", 0) or a.get("iscrowd", 0):
                gts[video][fid][2].append((x, y, w, h))
                continue
            tid = a.get("track_id", -1)
            if tid < 0:
                continue
            gts[video][fid][0].append(tid)
            gts[video][fid][1].append((x, y, w, h))
    out = {}
    for video, frames in gts.items():
        out[video] = [(fid, ids, tlwhs, ign) for fid, (ids, tlwhs, ign)
                      in sorted(frames.items())]
    return out


def run_fused(exp, model, params, dataset, args, chunk=32,
              min_box_area=100.0):
    """Fully on-device pipeline over the eval set: frames batch into
    lax.scan chunks, tracker state lives in HBM, only packed (T, 7) rows
    are fetched (drivers/stream.py; the bench.py serving path)."""
    from collections import defaultdict

    import jax.numpy as jnp
    import numpy as np

    from unicorn_tpu.drivers.stream import StreamingMOTPipeline

    pipe = StreamingMOTPipeline(
        model, params, input_size=exp.test_size, num_classes=exp.num_classes,
        conf_thre=exp.test_conf, nms_thre=exp.nmsthre,
        max_dets=256, max_tracks=256, track_thresh=args.track_thresh,
        match_thresh=args.match_thresh, n_cand=512,
        track_buffer=args.track_buffer,
        approx_topk=False)  # eval scores: exact top-k like the host path
    img_size = dataset.img_size
    results = defaultdict(list)
    buf, metas = [], []

    def flush():
        if not buf:
            return
        n_real = len(buf)
        while len(buf) < chunk:  # pad the video's final chunk; padded
            buf.append(buf[-1])  # frames only touch state after real ones
        outs = np.asarray(pipe.run_chunk(jnp.asarray(np.stack(buf))))
        # the 1.6 vertical-aspect filter is MOTChallenge-pedestrian-specific
        # (reference mot_evaluator.py:881-882 omits it for multi-class BDD)
        max_aspect = 1.6 if exp.num_classes == 1 else float("inf")
        for rows, (video, fid, scale) in zip(outs[:n_real], metas):
            rows = rows[rows[:, 6] > 0]
            tlwhs, tids, scores = [], [], []
            for r in rows:
                w_ = (r[2] - r[0]) / scale
                h_ = (r[3] - r[1]) / scale
                if w_ * h_ > min_box_area and w_ / max(h_, 1e-6) <= max_aspect:
                    tlwhs.append((r[0] / scale, r[1] / scale, w_, h_))
                    tids.append(int(r[5]))
                    scores.append(float(r[4]))
            results[video].append((fid, tids, tlwhs, scores))
        buf.clear()
        metas.clear()

    cur_video = None
    n = len(dataset) if args.max_frames is None else min(args.max_frames,
                                                         len(dataset))
    for i in range(n):
        img, _, info, _ = dataset[i]
        h, w, frame_id, video_id, file_name = info
        video = file_name.split("/")[0]
        if video != cur_video:
            flush()
            pipe.reset()
            cur_video = video
        scale = min(img_size[0] / float(h), img_size[1] / float(w))
        buf.append(img)
        metas.append((video, frame_id, scale))
        if len(buf) == chunk:
            flush()
    flush()
    return dict(results)


def main():
    from unicorn_tpu.utils.setup_env import configure_jax
    configure_jax()  # persistent compile cache: TPU graphs compile
    # through a slow remote queue; .jax_cache makes reruns instant

    args = make_parser().parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unicorn_tpu.core.checkpoint import load_checkpoint
    from unicorn_tpu.evaluators.mot_evaluator import MOTEvaluator
    from unicorn_tpu.exp.base import get_exp
    from unicorn_tpu.data.datasets.mot import MOTEvalDataset
    from unicorn_tpu.data.transforms import ValTransform
    from unicorn_tpu.models.heads import decode_for_inference
    from unicorn_tpu.models.unicorn import Unicorn
    from unicorn_tpu.ops.nms import postprocess_device
    from unicorn_tpu.exp.det import get_unicorn_datadir

    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    model = exp.get_model()
    if args.ckpt:
        ckpt = load_checkpoint(os.path.dirname(args.ckpt) or ".",
                               os.path.basename(args.ckpt))
        params = ckpt.get("ema_params", ckpt.get("params"))
    else:
        dummy = jnp.asarray(np.zeros((1, *exp.test_size, 3), np.float32))
        params = model.init(jax.random.PRNGKey(0), dummy,
                            method=Unicorn.init_all)

    dataset = MOTEvalDataset(
        data_dir=os.path.join(get_unicorn_datadir(), "mot"),
        json_file=exp.test_ann, name=exp.test_name, img_size=exp.test_size,
        # letterbox to test_size: both the host step_fn and the fused
        # pipeline consume letterbox-coordinate frames (and divide the
        # output boxes by the letterbox scale); raw native-res frames
        # would also recompile per video resolution
        preproc=ValTransform(),
    )

    if args.fused:
        results = run_fused(exp, model, params, dataset, args,
                            chunk=args.chunk)
        if args.result_dir:
            from unicorn_tpu.evaluators.mot_evaluator import write_mot_results

            os.makedirs(args.result_dir, exist_ok=True)
            for vname, res in results.items():
                write_mot_results(
                    os.path.join(args.result_dir, f"{vname}.txt"), res)
    else:
        @jax.jit
        def step(params, frame):
            raw, _ = model.apply(params, frame, method=Unicorn.forward_whole)
            dec = decode_for_inference(raw, (8, 16, 32), mode="mot")
            return postprocess_device(
                dec, num_classes=exp.num_classes, conf_thre=exp.test_conf,
                nms_thre=exp.nmsthre, n_cand=512, max_out=256,
            )

        def step1(params, frame):
            dets, valid = step(params, frame)
            return dets[0], valid[0]

        evaluator = MOTEvaluator(
            exp=exp, dataset=dataset, track_thresh=args.track_thresh,
            track_buffer=args.track_buffer, match_thresh=args.match_thresh,
        )
        results = evaluator.evaluate(step1, params,
                                     result_dir=args.result_dir,
                                     max_frames=args.max_frames,
                                     tracker=args.tracker)
    gts = load_gt_from_dataset(dataset)
    if any(gts.values()):
        print(MOTEvaluator.score(results, gts))
    else:
        print(f"wrote results for {len(results)} videos to {args.result_dir}")


if __name__ == "__main__":
    main()
