#!/usr/bin/env python
"""Reference-CLI-compatible entrypoint (same name as the reference repo's
test_clip2.py); delegates to cvpr2021_vspw_implement_tpu.test_clip."""
from cvpr2021_vspw_implement_tpu.test_clip import main

if __name__ == "__main__":
    main()
