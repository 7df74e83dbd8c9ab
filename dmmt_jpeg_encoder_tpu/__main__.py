"""`python -m dmmt_jpeg_encoder_tpu` entry point (reference: src/main.rs:5-12)."""

import sys

from .cli import main

sys.exit(main())
