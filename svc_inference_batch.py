#!/usr/bin/env python
"""Entry point mirroring the reference svc_inference_batch.py."""
from whisper_vits_svc_tpu.cli.misc import inference_batch_main

if __name__ == "__main__":
    inference_batch_main()
