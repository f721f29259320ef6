"""asr_finetune_tpu — a TPU-native Whisper fine-tuning framework.

Built from scratch in JAX/XLA/Pallas/pjit with the capabilities of the
asr4memory/asr-finetune reference stack (HF Seq2SeqTrainer + Ray Train/Tune +
PEFT/DeepSpeed on CUDA), re-designed TPU-first:

- functional Whisper encoder-decoder over param pytrees (models/whisper.py)
- on-device log-mel frontend (ops/logmel.py, ops/logmel_pallas.py)
- single jitted train step with grad-accum via lax.scan (training/train_step.py)
- pjit/GSPMD data+tensor parallelism over a jax.sharding.Mesh (parallel/)
- LoRA/AdaLoRA adapter pytrees over an int8-frozen base (training/lora.py)
- Orbax checkpointing with metric-scored retention (training/checkpoint.py)
- batched greedy/beam decode + WER evaluation (evaluation/)
- native HPO controller with ASHA / random search / PBT (hpo/)
"""

__version__ = "0.1.0"
