from android_svo_tpu.ops import pyramid, interp, detect
