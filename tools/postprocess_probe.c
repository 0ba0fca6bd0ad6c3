/* dump reference postprocess (XFADE/REVMIX) + NORMALIZE conversions */
#include <stdio.h>
#include <stdlib.h>
#include "audiality2.h"
#include "a2_waves.h"

int main(void)
{
    A2_config *cfg = a2_OpenConfig(44100, 4096, 1, A2_TIMESTAMP | A2_AUTOCLOSE);
    a2_AddDriver(cfg, a2_NewDriver(A2_AUDIODRIVER, "buffer"));
    A2_interface *iface = a2_Open(cfg);
    srand(777);
    enum { N = 256 };
    static int16_t in[N];
    for(int s = 0; s < N; ++s)
        in[s] = (int16_t)(rand() & 0xffff);
    FILE *f = fopen("/tmp/upconv2_in.bin", "wb");
    fwrite(in, 2, N, f); fclose(f);
    unsigned flagsets[] = { A2_XFADE, A2_REVMIX, A2_NORMALIZE,
                            A2_NORMALIZE | A2_XFADE, A2_LOOPED | A2_XFADE };
    f = fopen("/tmp/upconv2_out.bin", "wb");
    for(int t = 0; t < 5; ++t)
    {
        A2_handle h = a2_UploadWave(iface, A2_WWAVE, 0, flagsets[t],
                A2_I16, in, N * 2);
        if(h < 0) { printf("fail %d\n", t); return 1; }
        A2_wave *w = a2_GetWave(iface, h);
        fwrite(w->d.wave.data[0] + 1, 2, N, f);
        a2_Release(iface, h);
    }
    fclose(f);
    a2_Close(iface);
    printf("ok\n");
    return 0;
}
