#!/usr/bin/env python
"""Reference-CLI-compatible entrypoint (same name as the reference repo's
VC_perclip.py); delegates to cvpr2021_vspw_implement_tpu.vc_perclip."""
from cvpr2021_vspw_implement_tpu.vc_perclip import main

if __name__ == "__main__":
    main()
