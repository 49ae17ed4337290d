"""cl_object_detection_tpu — TPU-native class-incremental object detection.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
EonianCoda/CL_object_detection reference (PyTorch, single-GPU): RetinaNet
(ResNet-18/34/50/101/152 + FPN) trained class-incrementally on COCO-json
datasets (VOC2007 scenarios like ``20``, ``15+1``, ``10+10``), with the full
battery of continual-learning methods — distillation, exemplar replay
(random/herding/prototype), MAS, A-GEM, BiC, pseudo-labeling, prototype
anchoring, similarity-based classifier warm-start — rebuilt as pure
functional transforms over jit-compiled train steps sharded across a
``jax.sharding.Mesh``.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

    cli/        train / validate / detect entry points
    train/      train-step + loop orchestration, IL trainer state machine
    il/         continual-learning methods as pure loss transforms
    models/     flax ResNet + FPN + heads, classifier expansion surgery
    ops/        detection math: anchors, IoU, focal, box codec, NMS (Pallas)
    data/       COCO-json datasets, static-shape input pipeline
    eval/       COCO-protocol per-class AP/AR evaluator + reports
    parallel/   mesh / sharding rules / collectives
    utils/      checkpointing (orbax), metrics, logging
"""

__version__ = "0.1.0"
