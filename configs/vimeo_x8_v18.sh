# Vimeo-90K septuplet training (BASELINE config 4)
CRFP_FLAGS="--dataset Vimeo7 --variant v18 --mid_channels 32 --scale 8 \
 --lr_rate 2e-4 --lr_rate_flow 2.5e-5 --batch_size 8 --GT_size 256 \
 --FV_size 128 --N_frames 7 --num_epochs 80"
