"""Config-as-Python-class experiment system.

Reference: unicorn/exp/base_exp.py:17-75 (BaseExp with abstract factories and
CLI `merge(opts)` with type coercion) and unicorn/exp/build.py:10-50
(`get_exp` importlib loader). Kept as the compatibility surface: the 20
concrete configs in exps/default define the public config API.
"""
from __future__ import annotations

import ast
import importlib.util
import os
import pprint
import sys
from abc import ABC, abstractmethod


class BaseExp(ABC):
    """Basic class for any experiment."""

    seed = None
    output_dir = "./Unicorn_outputs"
    print_interval = 100
    eval_interval = 10

    @abstractmethod
    def get_model(self):
        ...

    def get_data_loader(self, batch_size, is_distributed):
        raise NotImplementedError

    def get_optimizer(self, batch_size):
        raise NotImplementedError

    def get_lr_scheduler(self, lr, iters_per_epoch):
        raise NotImplementedError

    def get_trainer_evaluator(self, batch_size=1):
        """Evaluator for the Trainer's in-training eval + best-ckpt loop.
        Defaults to get_evaluator(); track exps override with a COCO box
        evaluator — the reference evaluates detection AP during uni
        training (unicorn_track.py:402-443), not MOT metrics."""
        import inspect

        # tolerate subclasses implementing the documented no-arg signature
        if "batch_size" in inspect.signature(self.get_evaluator).parameters:
            return self.get_evaluator(batch_size=batch_size)
        return self.get_evaluator()

    def get_evaluator(self):
        raise NotImplementedError

    def eval(self, model, evaluator, weights):
        raise NotImplementedError

    def __repr__(self):
        exp_table = [
            (k, pprint.pformat(v))
            for k, v in vars(self).items()
            if not k.startswith("_")
        ]
        return "\n".join(f"{k:25s}: {v}" for k, v in exp_table)

    def merge(self, cfg_list):
        """CLI override: ['key', 'value', ...] with literal-eval coercion
        (base_exp.py:63-75)."""
        assert len(cfg_list) % 2 == 0
        for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
            if k.startswith("--"):
                k = k[2:]
            if hasattr(self, k):
                src_value = getattr(self, k)
                src_type = type(src_value)
                if src_value is not None and src_type != str:
                    try:
                        v = ast.literal_eval(v)
                    except (ValueError, SyntaxError):
                        pass
                setattr(self, k, v)


def get_exp_by_file(exp_file: str):
    """Load an Exp() from a python file (exp/build.py:10-27)."""
    sys.path.append(os.path.dirname(exp_file))
    spec = importlib.util.spec_from_file_location("current_exp", exp_file)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.Exp()


def get_exp_by_name(exp_name: str):
    import unicorn_tpu

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(unicorn_tpu.__file__)))
    filename = exp_name.replace("-", "_") + ".py"
    return get_exp_by_file(os.path.join(repo_root, "exps", "default", filename))


def get_exp(exp_file=None, exp_name=None):
    """(exp/build.py:35-50)."""
    assert exp_file is not None or exp_name is not None
    if exp_file is not None:
        return get_exp_by_file(exp_file)
    return get_exp_by_name(exp_name)
