# Recipe of record: CRFP_DSV (v18) on REDS 8x (train.sh flag bundle)
CRFP_FLAGS="--dataset Reds --variant v18 --mid_channels 32 --scale 8 \
 --lr_rate 2e-4 --lr_rate_flow 2.5e-5 --batch_size 8 --GT_size 256 \
 --FV_size 128 --N_frames 15 --num_epochs 80"
