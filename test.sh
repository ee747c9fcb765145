#### Test on the REDS4 clips (train 000/011/015/020)
python3 main.py --save_dir ./test/REDS/FVSR_x8_dsv_v18 \
               --reset true \
               --log_file_name test.log \
               --dataset Reds \
               --dataset_dir /DATA/REDS_sharp/ \
               --variant v18 \
               --mid_channels 32 \
               --scale 8 \
               --FV_size 128 \
               --GT_size 256 \
               --N_frames 15 \
               --model_path ./train/REDS/FVSR_x8_dsv_v18/model \
               --test true
