"""MOT/MOTS evaluation with QDTrack embedding association
(reference tools/track_omni.py; --mots adds CondInst masks).
"""
import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser():
    p = argparse.ArgumentParser("unicorn_tpu track_omni (QDTrack)")
    p.add_argument("-f", "--exp_file", default=None)
    p.add_argument("-n", "--name", default=None)
    p.add_argument("-c", "--ckpt", default=None)
    p.add_argument("--mots", action="store_true")
    p.add_argument("--dataset", default="motchallenge",
                   choices=["motchallenge", "bdd"],
                   help="eval set: MOT17-style COCO json or BDD100K scalabel")
    p.add_argument("--mask_thres", type=float, default=0.3)
    p.add_argument("--tracker", default="qd", choices=["qd", "deepsort"],
                   help="association: qd (QDTrack, default) or the legacy "
                        "DeepSORT baseline on the same embeddings "
                        "(reference evaluate_deepsort)")
    p.add_argument("--result-dir", default="track_omni_results")
    p.add_argument("--score-gt", default=None,
                   help="dir of MOTS-Challenge gt txts ({video}.txt); with "
                        "--mots, scores sMOTSA/MOTSA/IDF1 after writing")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p


def main():
    from unicorn_tpu.utils.setup_env import configure_jax
    configure_jax()  # persistent compile cache: TPU graphs compile
    # through a slow remote queue; .jax_cache makes reruns instant

    args = make_parser().parse_args()
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unicorn_tpu.core.checkpoint import load_checkpoint
    from unicorn_tpu.data.datasets.mot import MOTEvalDataset
    from unicorn_tpu.drivers.mot import MOTOmniDriver
    from unicorn_tpu.exp.base import get_exp
    from unicorn_tpu.exp.det import get_unicorn_datadir
    from unicorn_tpu.models.unicorn import Unicorn

    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    model = exp.get_model()
    if getattr(exp, "serve_interact_bf16", False):
        model = model.clone(interact_dtype=jnp.bfloat16)
    if args.ckpt:
        ckpt = load_checkpoint(os.path.dirname(args.ckpt) or ".",
                               os.path.basename(args.ckpt))
        params = ckpt.get("ema_params", ckpt.get("params"))
    else:
        dummy = jnp.asarray(np.zeros((1, *exp.test_size, 3), np.float32))
        params = model.init(jax.random.PRNGKey(0), dummy,
                            method=Unicorn.init_all)

    driver = MOTOmniDriver(model, params, exp.test_size,
                           num_classes=exp.num_classes,
                           conf_thre=exp.test_conf, nms_thre=exp.nmsthre,
                           with_mask=args.mots, mask_thres=args.mask_thres,
                           tracker=args.tracker)

    if args.dataset == "bdd":
        import json

        from unicorn_tpu.data.datasets.bdd import BDDEvalDataset
        from unicorn_tpu.evaluators.bdd_evaluator import (
            BDDEvaluator, score_scalabel, score_scalabel_seg,
        )

        dataset = BDDEvalDataset(
            data_dir=os.path.join(get_unicorn_datadir(), "bdd100k"),
            split=exp.test_name if exp.test_name != "test" else "val",
            img_size=exp.test_size)
        evaluator = BDDEvaluator(dataset, exp.test_size,
                                 conf_thre=exp.test_conf,
                                 nms_thre=exp.nmsthre)
        os.makedirs(args.result_dir, exist_ok=True)
        if args.mots:
            # BDD seg_track: bitmask PNGs + seg_track.json + mask-IoU
            # mMOTSA when the gt labels carry rles (seg_track_20 split)
            results, pred_frames = evaluator.evaluate_seg_mot(
                driver, out_dir=args.result_dir, max_frames=args.max_frames,
                mask_thres=args.mask_thres)
            gt = dataset.gt_frames()
            if args.max_frames is not None:
                gt = gt[:args.max_frames]
            scores = score_scalabel_seg(pred_frames, gt)
            json.dump(scores, open(os.path.join(args.result_dir,
                                                "seg_scores.json"), "w"),
                      default=float, indent=1)
            print(f"BDD seg_track: mMOTSA={scores['mMOTSA']:.4f} "
                  f"mIDF1={scores['mIDF1']:.4f} over "
                  f"{len(scores['per_class'])} classes")
            return
        results, pred_frames = evaluator.evaluate_mot(
            driver, out_dir=args.result_dir, max_frames=args.max_frames)
        gt = dataset.gt_frames()
        if args.max_frames is not None:
            gt = gt[:args.max_frames]
        scores = score_scalabel(pred_frames, gt)
        json.dump(scores, open(os.path.join(args.result_dir, "scores.json"),
                               "w"), default=float, indent=1)
        print(f"BDD {args.dataset}: mMOTA={scores['mMOTA']:.4f} "
              f"mIDF1={scores['mIDF1']:.4f} over "
              f"{len(scores['per_class'])} classes")
        return

    dataset = MOTEvalDataset(
        data_dir=os.path.join(get_unicorn_datadir(), "mot"),
        json_file=exp.test_ann, name=exp.test_name, img_size=exp.test_size,
    )
    results = defaultdict(list)
    mots_frames = defaultdict(list)
    cur_video = None
    n = len(dataset) if args.max_frames is None else min(args.max_frames,
                                                          len(dataset))
    for i in range(n):
        img, _, info, _ = dataset.pull_item(i)
        h, w, frame_id, video_id, file_name = info
        video = file_name.split("/")[0]
        if video != cur_video:
            cur_video = video
            driver.reset()
        if args.mots:
            from unicorn_tpu.evaluators.mot_evaluator import merge_mots_masks

            bboxes, labels, ids, masks = driver.update(img)
            out_ids, out_labels, out_scores, tlwhs, rles = merge_mots_masks(
                ids, labels,
                bboxes[:, 4] if len(bboxes) else np.zeros((0,)), bboxes,
                masks, args.mask_thres, driver.last_scale, (h, w),
                exp.test_size)
            results[video].append((frame_id, out_ids, tlwhs, out_scores))
            # MOTS-Challenge encoding: pedestrians are class 2, object id =
            # 2000 + track (reference mot_evaluator.py:890+)
            mots_frames[video].append(
                (frame_id, [2000 + int(t) for t in out_ids],
                 [2] * len(out_ids), rles))
        else:
            bboxes, labels, ids = driver.update(img)
            tlwhs = [(b[0], b[1], b[2] - b[0], b[3] - b[1]) for b in bboxes]
            results[video].append(
                (frame_id, ids.tolist(), tlwhs,
                 bboxes[:, 4].tolist() if len(bboxes) else []))
    os.makedirs(args.result_dir, exist_ok=True)
    if args.mots:
        from unicorn_tpu.evaluators.mots_metrics import (
            score_mots_txt, write_mots_txt,
        )

        for video, frames in mots_frames.items():
            write_mots_txt(os.path.join(args.result_dir, f"{video}.txt"),
                           frames)
        print(f"wrote {len(mots_frames)} MOTS-Challenge txt videos to "
              f"{args.result_dir}")
        if args.score_gt:
            import json

            # gt dir holds MOTS-Challenge txts named {video}.txt (the
            # mask-IoU CLEAR-MOT scoring the reference defers to the
            # MOTChallenge devkit for)
            gt_txts = {v: os.path.join(args.score_gt, f"{v}.txt")
                       for v in mots_frames
                       if os.path.exists(
                           os.path.join(args.score_gt, f"{v}.txt"))}
            scores = score_mots_txt(args.result_dir, gt_txts, class_id=2)
            json.dump(scores, open(os.path.join(args.result_dir,
                                                "mots_scores.json"), "w"),
                      default=float, indent=1)
            print(f"MOTS: sMOTSA={scores['sMOTSA']:.4f} "
                  f"MOTSA={scores['MOTSA']:.4f} IDF1={scores['IDF1']:.4f} "
                  f"over {len(gt_txts)} videos")
        return
    from unicorn_tpu.evaluators.mot_evaluator import write_mot_results

    for video, res in results.items():
        write_mot_results(os.path.join(args.result_dir, f"{video}.txt"), res)
    print(f"wrote {len(results)} videos to {args.result_dir}")


if __name__ == "__main__":
    main()
