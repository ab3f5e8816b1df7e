#!/usr/bin/env python
"""Reference-CLI-compatible entrypoint (same name as the reference repo's
test.py); delegates to cvpr2021_vspw_implement_tpu.test."""
from cvpr2021_vspw_implement_tpu.test import main

if __name__ == "__main__":
    main()
