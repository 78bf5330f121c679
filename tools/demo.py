"""Image/video/webcam demo predictor (reference tools/demo.py).

Usage:
  python tools/demo.py image -f <exp> -c <ckpt> --path img_or_dir --save-dir out
  python tools/demo.py video -f <exp> -c <ckpt> --path vid.mp4 --save-dir out
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser():
    p = argparse.ArgumentParser("unicorn_tpu demo")
    p.add_argument("demo", choices=["image", "video", "webcam"])
    p.add_argument("-f", "--exp_file", default=None)
    p.add_argument("-n", "--name", default=None)
    p.add_argument("-c", "--ckpt", default=None)
    p.add_argument("--path", default="./assets")
    p.add_argument("--save-dir", default="demo_out")
    p.add_argument("--conf", type=float, default=0.3)
    p.add_argument("--nms", type=float, default=0.65)
    # NOT argparse.REMAINDER: with a leading positional (demo mode) REMAINDER
    # swallows every following option, so the documented
    # `demo.py image -f <exp>` silently ran with exp_file=None.
    p.add_argument("opts", nargs="*")
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
    from unicorn_tpu.data.preproc import letterbox
    from unicorn_tpu.exp.base import get_exp
    from unicorn_tpu.models.heads import decode_for_inference
    from unicorn_tpu.models.unicorn import Unicorn
    from unicorn_tpu.ops.nms import postprocess_device
    from unicorn_tpu.utils.visualize import draw_detections

    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    model = exp.get_model()
    if args.ckpt:
        ckpt = load_checkpoint(os.path.dirname(args.ckpt) or ".",
                               os.path.basename(args.ckpt))
        params = ckpt.get("ema_params", ckpt.get("params"))
    else:
        dummy = jnp.asarray(np.zeros((1, *exp.test_size, 3), np.float32))
        try:
            params = model.init(jax.random.PRNGKey(0), dummy,
                                method=Unicorn.init_all)
        except Exception:
            params = model.init(jax.random.PRNGKey(0), dummy)

    @jax.jit
    def step(params, frame):
        raw = model.apply(params, frame)
        if isinstance(raw, tuple):
            raw = raw[0]
        dec = decode_for_inference(raw, (8, 16, 32), mode="mot")
        return postprocess_device(dec, num_classes=exp.num_classes,
                                  conf_thre=args.conf, nms_thre=args.nms,
                                  n_cand=512, max_out=128)

    os.makedirs(args.save_dir, exist_ok=True)

    def predict(img):
        padded, r = letterbox(img, exp.test_size)
        dets, valid = step(params, jnp.asarray(padded[None]))
        d = np.asarray(dets[0])[np.asarray(valid[0])]
        if len(d):
            d[:, :4] /= r
        return d

    if args.demo == "image":
        paths = ([os.path.join(args.path, f) for f in sorted(os.listdir(args.path))]
                 if os.path.isdir(args.path) else [args.path])
        for p in paths:
            img = cv2.imread(p)
            if img is None:
                continue
            d = predict(img)
            vis = draw_detections(img, d)
            cv2.imwrite(os.path.join(args.save_dir, os.path.basename(p)), vis)
            print(f"{p}: {len(d)} detections")
    else:
        cap = cv2.VideoCapture(0 if args.demo == "webcam" else args.path)
        fps = cap.get(cv2.CAP_PROP_FPS) or 30
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        out_path = os.path.join(args.save_dir, "demo_out.mp4")
        writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps, (w, h))
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            writer.write(draw_detections(frame, predict(frame)))
        writer.release()
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
