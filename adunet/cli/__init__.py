"""Command-line entry points mirroring the reference scripts.

- ``python -m adunet.cli.train_sr``   ← Super_resolution/code/train_adaptive_unet.py
- ``python -m adunet.cli.train_seg``  ← Segmenation/code/train_adaptive_unet.py
- ``python -m adunet.cli.evaluate``   ← Super_resolution/code/evaluate_model.py
- ``python -m adunet.cli.export_log_metrics``   ← export_log_metrics.py
- ``python -m adunet.cli.analyse_experiment_metrics`` ← analyse_experiment_metrics.py
- ``python -m adunet.cli.plot_experiment_metrics``    ← plot_experiment_metrics.py
- ``python -m adunet.cli.tune``       ← u_net_vanilla_optuna.py / unet_vinillia_optuna.py
"""
