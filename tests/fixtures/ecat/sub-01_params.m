% HRRT reconstruction parameters
nb_frames = 4;
frame_duration = [300 300 300 300];
isotope_halflife = 1221.84;
recon_version = 'OSEM3D v1.2';
scatter_correction = 1;
this line has no assignment
